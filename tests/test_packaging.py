"""Packaging sanity: pyproject metadata resolves to real code.

The reference ships bash launch scripts only (train_sdxl_zh.sh etc.); this
framework is an installable package with console entry points, so guard that
every declared entry point imports and is callable, and that the native
tar-reader loader honors its documented search path.
"""
import importlib
import os

try:
    import tomllib  # stdlib on 3.11+
except ImportError:  # pyproject declares requires-python >= 3.10
    import tomli as tomllib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _pyproject():
    with open(os.path.join(REPO, "pyproject.toml"), "rb") as f:
        return tomllib.load(f)


def test_console_scripts_resolve():
    scripts = _pyproject()["project"]["scripts"]
    assert set(scripts) == {"pea-train", "pea-generate", "pea-serve",
                            "pea-evaluate"}
    for name, target in scripts.items():
        mod_name, func_name = target.split(":")
        mod = importlib.import_module(mod_name)
        fn = getattr(mod, func_name)
        assert callable(fn), f"{name} -> {target} is not callable"


def test_package_discovery_matches_tree():
    # every subpackage on disk must be importable under the declared root
    pkg_root = os.path.join(REPO, "pea_diffusion_tpu")
    for entry in sorted(os.listdir(pkg_root)):
        full = os.path.join(pkg_root, entry)
        if os.path.isdir(full) and os.path.exists(
                os.path.join(full, "__init__.py")):
            importlib.import_module(f"pea_diffusion_tpu.{entry}")


def test_native_reader_search_path_override(tmp_path, monkeypatch):
    from pea_diffusion_tpu.data import native_reader

    bogus = tmp_path / "libwds_tar.so"
    bogus.write_bytes(b"not a real so")
    monkeypatch.setattr(
        native_reader, "_SO_CANDIDATES",
        [str(bogus)] + list(native_reader._SO_CANDIDATES))
    assert native_reader._find_so() == str(bogus)
    # and without any candidate present, _find_so reports absence
    monkeypatch.setattr(native_reader, "_SO_CANDIDATES", [""])
    assert native_reader._find_so() is None
