"""CLI ControlNet / inpaint modes (--demo, tiny stacks, CPU) and the
numpy Canny fallback — the reference's controlnet/inpaint user surfaces
(tests/test_sdxl_zh_controlnet.py, tests/test_sdxl_zh_inpaint.py) exposed
on pea-generate."""
import numpy as np
import pytest
from PIL import Image

from pea_diffusion_tpu.cli.generate import main
from pea_diffusion_tpu.pipelines.controlnet import _canny_numpy, canny_edges


def test_canny_numpy_square_edges():
    img = np.zeros((48, 48), np.uint8)
    img[12:36, 12:36] = 255
    edges = _canny_numpy(img, 60, 120)
    assert edges.dtype == np.uint8
    # edges concentrate on the square border, interior stays empty
    assert edges[10:14, 20:28].any() or edges[11:15, 20:28].any()
    assert not edges[20:28, 20:28].any()
    assert edges.sum() > 0


def test_canny_edges_returns_3ch():
    img = np.zeros((32, 32, 3), np.uint8)
    img[8:24, 8:24] = 200
    out = canny_edges(img)
    assert out.shape == (32, 32, 3)
    assert (out[..., 0] == out[..., 1]).all()


def test_cli_controlnet_demo(tmp_path):
    ctrl = tmp_path / "ctrl.png"
    arr = np.zeros((64, 64, 3), np.uint8)
    arr[16:48, 16:48] = 255
    Image.fromarray(arr).save(ctrl)
    out = tmp_path / "out.png"
    main(["--demo", "--size", "64", "--steps", "2", "--prompt", "一只猫",
          "--control-image", str(ctrl), "--control-canny",
          "--control-scale", "0.8", "--control-end", "0.6",
          "-o", str(out)])
    assert Image.open(out).size == (16, 16)  # tiny VAE decodes latents x2


def test_cli_inpaint_demo(tmp_path):
    base = tmp_path / "base.png"
    mask = tmp_path / "mask.png"
    rng = np.random.RandomState(0)
    Image.fromarray(rng.randint(0, 255, (64, 64, 3), dtype=np.uint8) \
                    .astype(np.uint8)).save(base)
    m = np.zeros((64, 64), np.uint8)
    m[20:44, 20:44] = 255
    Image.fromarray(m).save(mask)
    out = tmp_path / "out.png"
    main(["--demo", "--size", "64", "--steps", "2", "--prompt", "一只猫",
          "--inpaint-image", str(base), "--mask", str(mask),
          "--strength", "0.8", "-o", str(out)])
    assert Image.open(out).size == (64, 64)  # stride-2 tiny VAE roundtrip


@pytest.mark.parametrize("argv", [
    ["--demo", "--control-image", "x.png", "--tp", "2"],
    ["--demo", "--inpaint-image", "x.png"],          # mask missing
    ["--control-image", "x.png"],                    # no --controlnet/--demo
    ["--demo", "--mask", "x.png"],                   # image missing
])
def test_cli_mode_arg_errors(argv):
    with pytest.raises(SystemExit):
        main(argv)
