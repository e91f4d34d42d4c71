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


@pytest.mark.slow
def test_cli_train_generate_eval_demo_loop(tmp_path):
    """The closed product loop at demo scale (VERDICT r4 #5 / the
    reference's actual workflow, train_sdxl_zh.py:443-448 ->
    tests/test_sdxl_zh.py:86-153): train a few KD steps, export
    proj_N/pytorch_model.bin, serve it via `generate --demo --adapter`
    against the SAME frozen towers, then smoke the metric plumbing with
    `evaluate --demo`."""
    import glob
    import os

    from pea_diffusion_tpu.cli import evaluate as eval_cli
    from pea_diffusion_tpu.cli import train as train_cli

    out = str(tmp_path / "run")
    # batch 8: divisible by the data axis on both the 8-device CPU test
    # mesh and single-chip hardware
    train_cli.main(["--demo", "--steps", "2", "--batch-size", "8",
                    "--every-n-steps", "1", "--log-every", "1",
                    "--output", out])
    projs = sorted(glob.glob(os.path.join(out, "proj_*")))
    assert projs, os.listdir(out)
    ckpt = os.path.join(projs[-1], "pytorch_model.bin")
    assert os.path.exists(ckpt)

    png = str(tmp_path / "img.png")
    main(["--demo", "--adapter", ckpt, "--size", "64", "--steps", "2",
          "--prompt", "一只猫", "-o", png])
    assert Image.open(png).size == (16, 16)

    # the trained adapter produces a different image than the random one
    png0 = str(tmp_path / "img0.png")
    main(["--demo", "--size", "64", "--steps", "2", "--prompt", "一只猫",
          "-o", png0])
    a = np.asarray(Image.open(png)).astype(np.int32)
    b = np.asarray(Image.open(png0)).astype(np.int32)
    assert np.abs(a - b).max() > 0

    prompts = tmp_path / "prompts.txt"
    prompts.write_text("一只猫\n")  # single prompt replicates over images
    # FID needs >= 2 samples per feature set (covariance, ddof=1)
    eval_cli.main(["--demo", "--images", png, png0,
                   "--prompts", str(prompts), "--fid-ref", png, png0])


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
