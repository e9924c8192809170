"""Per-arch conversion CLIs (ref scripts/model_conversion/*): RIDNet and
StyleGAN2 checkpoints produced from the reference torch modules convert to
orbax end to end."""

import os
import os.path as osp
import subprocess
import sys

import pytest
import torch

from ref_loader import load_ref_arch

ROOT = osp.abspath(osp.join(osp.dirname(__file__), ".."))

pytestmark = pytest.mark.skipif(
    not osp.exists("/root/reference/Car_Plate-Restoration"),
    reason="reference not mounted")


def _run(script, *argv):
    return subprocess.run(
        [sys.executable, osp.join(ROOT, "scripts", "model_conversion",
                                  script), *argv],
        capture_output=True, text=True, timeout=600,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})


def test_convert_ridnet_cli(tmp_path):
    ref = load_ref_arch("ridnet_arch")
    torch.manual_seed(0)
    tnet = ref.RIDNet(3, 64, 3)
    pth = tmp_path / "ridnet.pth"
    torch.save({"params": tnet.state_dict()}, pth)
    r = _run("convert_ridnet.py", "--ckpt", str(pth), "--out",
             str(tmp_path / "out"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "converted" in r.stdout


def test_convert_stylegan_cli(tmp_path):
    ref = load_ref_arch("stylegan2_arch")
    torch.manual_seed(0)
    tnet = ref.StyleGAN2Generator(input_width=32, input_height=32,
                                  num_style_feat=32, num_mlp=2,
                                  channel_multiplier=1)
    pth = tmp_path / "sg2.pth"
    torch.save({"params_ema": tnet.state_dict()}, pth)
    r = _run("convert_stylegan.py", "--ckpt", str(pth), "--size", "32",
             "--num_style_feat", "32", "--channel_multiplier", "1",
             "--num_mlp", "2",
             "--out", str(tmp_path / "out"))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "converted" in r.stdout
