"""CLI flag-surface compatibility: the reference README's commands parse.

Guards the alias layer (SURVEY.md section 2.5): README spellings
(--method sup/ei-shift/ei-rotate, --model_kind swinir/dip/pnp/bm3d/up/id,
--no-stop_gradient, --download, --device cuda:0) and the code spellings both
work.
"""

import os

import pytest

from sei_tpu.config import DefaultArgParser, add_test_args, add_train_args
from sei_tpu.losses import normalize_method
from sei_tpu.models import KIND_ALIASES, KINDS


def _train_parser():
    p = DefaultArgParser()
    add_train_args(p)
    return p


def _test_parser():
    p = DefaultArgParser()
    add_test_args(p)
    return p


def test_readme_train_command_parses():
    # README.md:49-56 (minus --download's network effect)
    args = _train_parser().parse_args(
        [
            "--device", "cpu",
            "--method", "proposed",
            "--task", "deblurring",
            "--kernel", "Gaussian_R2",
            "--out_dir", "/tmp/x",
        ]
    )
    assert args.method == "proposed" and args.kernel == "Gaussian_R2"


@pytest.mark.parametrize("method", ["proposed", "sup", "css", "ei-shift", "ei-rotate"])
def test_readme_method_spellings(method):
    args = _train_parser().parse_args(["--task", "deblurring", "--method", method])
    m, t = normalize_method(args.method, args.ProposedLoss__transforms)
    assert m in ("proposed", "supervised", "css")
    if method == "ei-shift":
        assert t == "Shifts"
    if method == "ei-rotate":
        assert t == "Rotations"


def test_readme_no_stop_gradient_alias():
    args = _train_parser().parse_args(
        ["--task", "deblurring", "--no-stop_gradient"]
    )
    assert args.ProposedLoss__stop_gradient is False


def test_readme_test_command_parses():
    # README.md:76-80
    args = _test_parser().parse_args(
        [
            "--device", "cpu",
            "--task", "deblurring",
            "--kernel", "Gaussian_R2",
            "--weights", "Div2K-Train_Deblurring_Gaussian_R2_Noise5_SEI",
        ]
    )
    assert args.weights.startswith("Div2K-Train")


@pytest.mark.parametrize("kind", ["swinir", "dip", "pnp", "bm3d", "up", "id"])
def test_readme_model_kind_spellings(kind):
    assert KIND_ALIASES[kind] in KINDS
    args = _test_parser().parse_args(["--task", "deblurring", "--model_kind", kind])
    assert args.model_kind == kind


def test_reference_namespaced_flags_exist():
    # the ClassName__param surface from ref src/settings.py:4-66
    args = _train_parser().parse_args(
        [
            "--task", "sr", "--sr_factor", "2",
            "--GroundTruthDataset__size", "128",
            "--SyntheticDataset__unique_seeds",
            "--PrepareTrainingPairs__crop_size", "96",
            "--ProposedModel__architecture", "Convolutional",
            "--ConvolutionalModel__hidden_channels", "16",
            "--ScalingTransform__kind", "normal",
            "--Loss__crop_size", "24",
            "--SyntheticDataset__deterministic_measurements",
            "--physics_true_adjoint",
            "--no-physics_v2",
            "--no-physics_antialias",
        ]
    )
    assert args.GroundTruthDataset__size == 128
    assert args.physics_v2 is False
    assert args.physics_antialias is False
    assert _train_parser().parse_args(
        ["--task", "sr", "--sr_factor", "2"]).physics_antialias is True


def test_no_resize_mutex():
    args = _test_parser().parse_args(
        ["--task", "deblurring", "--GroundTruthDataset__no_resize"]
    )
    assert args.GroundTruthDataset__size is None


def test_generate_dataset_positional_args():
    """The reference's generate_dataset CLI takes POSITIONAL image_dir/out_dir
    (ref demo/generate_dataset.py:22-23); both that form and the flag form
    must resolve to the same in_dir/out_dir."""
    import demo.generate_dataset as gd

    p = DefaultArgParser()
    p.add_argument("image_dir", type=str, nargs="?", default=None)
    p.add_argument("out_dir_pos", type=str, nargs="?", default=None)
    p.add_argument("--in_dir", type=str, default=None)
    p.add_argument("--out_dir", type=str, default=None)
    a = p.parse_args(["--task", "deblurring", "in_pics", "out_pics"])
    assert a.image_dir == "in_pics" and a.out_dir_pos == "out_pics"
    a2 = p.parse_args(["--in_dir", "in_pics", "--out_dir", "out_pics"])
    assert a2.in_dir == "in_pics" and a2.out_dir == "out_pics"
    assert gd is not None  # module imports cleanly


def test_eval_cli_save_images_and_psf(tmp_path):
    """demo/test.py --save_images writes the reference's three output trees
    (ground_truth/ predictors/ estimates/, ref demo/test.py:161-176) and
    --save_psf writes the normalized kernel (ref demo/test.py:86-98).
    Driven end-to-end as a subprocess with model_kind Identity."""
    import subprocess
    import sys

    import numpy as np

    from sei_tpu.data import write_image

    src = tmp_path / "gt"
    src.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        write_image(str(src / f"im{i}.png"),
                    rng.random((3, 40, 40)).astype(np.float32))
    out = tmp_path / "out"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "demo", "test.py"),
         "--device", "cpu", "--task", "deblurring", "--kernel", "Gaussian_R1",
         "--noise_level", "5", "--dataset", f"gt_folder:{src}",
         "--model_kind", "Identity", "--save_images", "--save_psf",
         "--out_dir", str(out)],
        capture_output=True, text=True, timeout=420, env=env, cwd=repo,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "PSNR:" in r.stdout
    assert (out / "psf.png").is_file()
    for tree in ("ground_truth", "predictors", "estimates"):
        files = list((out / tree).glob("*.png"))
        assert len(files) == 2, (tree, files, r.stdout)
