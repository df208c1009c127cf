"""LPIPS architecture, homogeneous-SR cache, native loader, N2I wrapper."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sei_tpu.data import GroundTruthDataset, build_device_cache, write_image
from sei_tpu.noise2inverse import measurement_slices, noise2inverse_model
from sei_tpu.physics import get_physics


@pytest.fixture(scope="module")
def img_path(tmp_path_factory):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    p = str(root / "a.png")
    write_image(p, rng.random((3, 64, 64)).astype(np.float32))
    return p


def test_lpips_with_synthetic_weights(tmp_path):
    import torch

    rng = np.random.default_rng(0)
    sd = {}
    cfg = [(64, 11, 3), (192, 5, 64), (384, 3, 192), (256, 3, 384), (256, 3, 256)]
    for (o, k, i), fi in zip(cfg, [0, 3, 6, 8, 10]):
        sd[f"features.{fi}.weight"] = torch.from_numpy(
            (rng.standard_normal((o, i, k, k)) * 0.02).astype(np.float32)
        )
        sd[f"features.{fi}.bias"] = torch.zeros(o)
    for j, (o, _, _) in enumerate(cfg):
        sd[f"lin{j}.model.1.weight"] = torch.from_numpy(
            np.abs(rng.standard_normal((1, o, 1, 1))).astype(np.float32)
        )
    path = str(tmp_path / "lpips.pth")
    torch.save(sd, path)

    from sei_tpu.metrics.lpips import LPIPS

    m = LPIPS(path)
    a = rng.random((3, 64, 64)).astype(np.float32)
    b = rng.random((3, 64, 64)).astype(np.float32)
    assert m(a, a) == 0.0
    assert m(a, b) > 0.0


def test_gt_folder_dataset(tmp_path):
    """gt_folder:<dir> treats a directory of PNGs as a ground-truth dataset
    (synthesis + metrics) — extension over the reference's predictor-only
    directory mode (ref demo/test.py:64-80)."""
    rng = np.random.default_rng(1)
    for name in ("b.png", "a.png"):
        write_image(str(tmp_path / name), rng.random((3, 48, 40)).astype(np.float32))
    gt = GroundTruthDataset(dataset_name=f"gt_folder:{tmp_path}", size=32)
    assert len(gt) == 2
    # sorted order => deterministic per-image unique ids
    assert [gt.unique_id(i) for i in range(2)] == [0, 1]
    x = gt[0]
    assert x.shape[0] == 3 and min(x.shape[-2:]) == 32  # shorter-side resize
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = build_device_cache(gt, phys, base_key=jax.random.PRNGKey(0))
    assert cache.x.shape[0] == 2 and np.isfinite(np.asarray(cache.y)).all()


def test_homogeneous_sr_cache_upsamples_y(img_path):
    phys = get_physics(task="sr", sr_factor=2, noise_level=5)
    gt = GroundTruthDataset(
        dataset_name="single_image", size=64, memoize_gt=False,
        single_image_blueprint={"image_path": img_path, "duplicates_count": 2},
    )
    cache = build_device_cache(
        gt, phys, base_key=jax.random.PRNGKey(0), upsample_y_to_x=True
    )
    assert cache.y.shape[-2:] == cache.x.shape[-2:]
    assert cache.rate == 1


def test_native_loader_matches_python(img_path):
    from sei_tpu.data import native
    from sei_tpu.data.loader import read_image
    from sei_tpu.ops.resize import resize_shorter_side_np

    if not native.available():
        pytest.skip("native loader not built")
    out = native.load_png_batch([img_path] * 3, size=48)
    want = resize_shorter_side_np(read_image(img_path), 48, antialias=True)
    for im in out:
        np.testing.assert_allclose(im, want, atol=1e-6)


def test_n2i_slices_partition_measurement():
    rng = np.random.default_rng(1)
    y = jnp.asarray(rng.random((1, 3, 16, 16), dtype=np.float32))
    slices = measurement_slices(y, 4)
    np.testing.assert_allclose(np.asarray(sum(slices)), np.asarray(y), atol=1e-7)


def test_n2i_model_runs_for_deblurring():
    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((1, 3, 32, 32), dtype=np.float32))
    y = phys.degrade(x, jax.random.PRNGKey(0))
    model = noise2inverse_model(
        lambda t: t, task="deblurring", kernel=phys.kernel,
        degradation_inverse_fn=phys.A_dagger,
    )
    out = model(y)
    assert out.shape == y.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_bm3d_denoise_quality():
    from sei_tpu.metrics import psnr
    from sei_tpu.models.bm3d import bm3d_denoise

    rng = np.random.default_rng(0)
    x = np.zeros((64, 64), np.float32)
    x[16:48, 16:48] = 0.7
    x[28:36, :] = 0.3
    sigma = 25 / 255
    z = x + sigma * rng.standard_normal((64, 64)).astype(np.float32)
    den = np.asarray(bm3d_denoise(jnp.asarray(z), sigma))
    assert float(psnr(den, x)) > float(psnr(z, x)) + 10.0


def test_bm3d_deblur_improves_psnr():
    from sei_tpu.metrics import psnr
    from sei_tpu.models import get_model

    phys = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    rng = np.random.default_rng(1)
    x = np.zeros((1, 3, 48, 48), np.float32)
    x[..., 12:36, 12:36] = 0.8
    y = np.asarray(phys.degrade(jnp.asarray(x), jax.random.PRNGKey(0)))
    model = get_model(kind="BM3D", task="deblurring", physics=phys, noise_level=5)
    out = np.asarray(model(jnp.asarray(y)))
    assert float(psnr(out, x)) > float(psnr(y, x))


def test_bench_leg_and_sweep():
    """utils.bench: fresh-closure legs honor trace-time env knobs (the
    round-3 probe-poisoning class; STATUS 'Probe-methodology findings')."""
    import os

    import jax.numpy as jnp

    from sei_tpu.utils.bench import bench_leg, sweep

    x = jnp.ones((8, 8), jnp.float32)

    def make_fn():
        k = float(os.environ.get("SEI_TEST_KNOB", "1"))

        def fn(xx, t):
            return xx * k + t

        return fn

    ms = bench_leg(make_fn, x, iters=2, windows=2)
    assert ms >= 0.0
    res = sweep([("k1", {"SEI_TEST_KNOB": "1"}, make_fn),
                 ("k2", {"SEI_TEST_KNOB": "2"}, make_fn)], x)
    assert set(res) == {"k1", "k2"}
    assert os.environ.get("SEI_TEST_KNOB") is None


def test_bench_constants_parse_from_baseline_md():
    """bench.py pins BOTH derived constants (A100 img/s and the per-image
    FLOP model) to BASELINE.md so numbers and derivations cannot drift
    apart (VERDICT r4 weak-item 5)."""
    import importlib.util
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "sei_bench", os.path.join(root, "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    assert mod.A100_REFERENCE_IMAGES_PER_SEC == 35.0
    assert mod.GFLOP_PER_IMAGE == 506.0
    # the prose derivation must still state the same figure
    with open(os.path.join(root, "BASELINE.md")) as f:
        assert "506 GFLOP per image" in f.read()


def test_get_physics_exposes_antialias():
    """Physics.antialias is settable through the factory (VERDICT r4
    weak-item 6): antialias=False reproduces the raw-bicubic downsample."""
    import jax.numpy as jnp
    import numpy as np

    from sei_tpu.ops import resize
    from sei_tpu.physics import get_physics

    p_aa = get_physics(task="sr", sr_factor=2, noise_level=5)
    p_raw = get_physics(task="sr", sr_factor=2, noise_level=5,
                        antialias=False)
    assert p_aa.antialias and not p_raw.antialias

    x = jnp.asarray(np.random.default_rng(0).random((1, 3, 16, 16)),
                    jnp.float32)
    np.testing.assert_allclose(
        np.asarray(p_raw.A(x)),
        np.asarray(resize(x, scale_factor=0.5, antialias=False)),
        rtol=1e-6)
    assert float(jnp.abs(p_aa.A(x) - p_raw.A(x)).max()) > 1e-4
