"""Integration tests: device cache, sharded train step, checkpoint round-trip.

Runs on the virtual 8-device CPU mesh with a small Convolutional model (the
reference provides SingleImageDataset + the Convolutional architecture
precisely for cheap runs - SURVEY.md section 4.3).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sei_tpu.data import DeviceDataCache, GroundTruthDataset, build_device_cache, sample_train_batch
from sei_tpu.losses import get_loss
from sei_tpu.models import Model, get_model
from sei_tpu.parallel import make_mesh, replicate
from sei_tpu.physics import get_physics
from sei_tpu.train.trainer import Trainer


@pytest.fixture(scope="module")
def tiny_setup(tmp_path_factory):
    # a single 64x64 synthetic image dataset on disk
    from sei_tpu.data import write_image

    root = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(0)
    img = rng.random((3, 80, 64)).astype(np.float32)
    path = str(root / "img.png")
    write_image(path, img)
    return path


def _make_cache(path, physics, size=64):
    gt = GroundTruthDataset(
        dataset_name="single_image",
        size=size,
        memoize_gt=True,
        single_image_blueprint={"image_path": path, "duplicates_count": 8},
    )
    return build_device_cache(gt, physics, base_key=jax.random.PRNGKey(0))


def test_device_cache_shapes_and_determinism(tiny_setup):
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    assert cache.x.shape[0] == 8
    assert cache.x.shape[-2:] == cache.y.shape[-2:]
    # deterministic: rebuilding gives identical measurements
    cache2 = _make_cache(tiny_setup, physics)
    np.testing.assert_allclose(np.asarray(cache.y), np.asarray(cache2.y))


def test_sample_train_batch_aligned_sr(tiny_setup):
    physics = get_physics(task="sr", sr_factor=2, noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    x, y = sample_train_batch(
        cache, jax.random.PRNGKey(1), batch_size=4, crop_size=24
    )
    assert y.shape == (4, 3, 24, 24)
    assert x.shape == (4, 3, 48, 48)


def test_trainer_loss_decreases(tiny_setup):
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    model = get_model(
        kind="Proposed", architecture="Convolutional", task="deblurring",
        conv_blueprint={"scales": 2, "hidden_channels": 8}, init_input_size=32,
    )
    loss_fn = get_loss(
        method="supervised", physics=physics, noise_level=5, crop_size=32
    )
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=8, epochs=30, lr=2e-3, crop_size=64, out_dir=None,
    )
    losses = []
    trainer.train(log_every_epoch=False,
                  on_epoch_end=lambda e, s, l: losses.append(l))
    assert losses[-1] < losses[0] * 0.9, losses[:3] + losses[-3:]


def test_trainer_sharded_batch_over_mesh(tiny_setup):
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    mesh = make_mesh()  # 8 virtual devices
    assert mesh.devices.size == 8
    model = get_model(
        kind="Proposed", architecture="Convolutional", task="deblurring",
        conv_blueprint={"scales": 2, "hidden_channels": 8}, init_input_size=32,
    )
    loss_fn = get_loss(method="proposed", physics=physics, crop_size=32)
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=8, epochs=1, lr=1e-4, crop_size=64, mesh=mesh,
    )
    state = trainer.init_state()
    step = trainer._get_step(0)
    new_state, loss = step(state, cache, trainer.base_key)
    assert bool(jnp.isfinite(loss))
    # params stay replicated across all 8 devices
    leaf = jax.tree_util.tree_leaves(new_state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_sharded_step_matches_single_device(tiny_setup):
    """The psum/sharding path must be a pure refactor: one train step on a
    1-device mesh and on the 8-device mesh, same params/keys, must produce
    the same loss and updated params (the DataParallel capability at ref
    src/models/__init__.py:142-145, rebuilt as SPMD batch sharding)."""
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    model = get_model(
        kind="Proposed", architecture="Convolutional", task="deblurring",
        conv_blueprint={"scales": 2, "hidden_channels": 8}, init_input_size=32,
    )
    loss_fn = get_loss(method="proposed", physics=physics, crop_size=32)

    def one_step(mesh):
        trainer = Trainer(
            model=model, loss_fn=loss_fn, physics=physics, cache=cache,
            batch_size=8, epochs=1, lr=1e-4, crop_size=64, mesh=mesh,
        )
        state = trainer.init_state()
        new_state, loss = trainer._get_step(0)(state, cache, trainer.base_key)
        return float(loss), jax.device_get(new_state.params)

    loss1, params1 = one_step(make_mesh(jax.devices()[:1]))
    loss8, params8 = one_step(make_mesh())
    assert np.isclose(loss1, loss8, rtol=1e-5), (loss1, loss8)
    for a, b in zip(
        jax.tree_util.tree_leaves(params1), jax.tree_util.tree_leaves(params8)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )


def test_flat_optimizer_matches_tree(tiny_setup, monkeypatch):
    """The optimizer layouts are pure speed refactors and must produce
    identical params after one step: flat-STATE (default: params live as one
    raveled vector, grad w.r.t. the vector, pure vector Adam —
    perf_probe_r4a: 0.035 ms/update), optax.flatten (re-ravels grads per
    step, 2.1 ms), and the plain tree form (7.3 ms)."""
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    model = get_model(
        kind="Proposed", architecture="Convolutional", task="deblurring",
        conv_blueprint={"scales": 2, "hidden_channels": 8}, init_input_size=32,
    )
    loss_fn = get_loss(method="supervised", physics=physics, crop_size=32)

    def one_step(flat_state, flat_opt):
        monkeypatch.setenv("SEI_FLAT_STATE", "1" if flat_state else "0")
        monkeypatch.setenv("SEI_FLAT_OPT", "1" if flat_opt else "0")
        trainer = Trainer(
            model=model, loss_fn=loss_fn, physics=physics, cache=cache,
            batch_size=4, epochs=1, lr=1e-3, crop_size=64, out_dir=None,
        )
        state = trainer.init_state()
        assert trainer.flat_state == flat_state
        if flat_state:
            assert jnp.ndim(state.params) == 1  # one raveled vector
        new_state, loss = trainer._get_step(0)(state, cache, trainer.base_key)
        return float(loss), jax.device_get(trainer._params_tree(new_state))

    loss_fs, params_fs = one_step(True, False)
    loss_f, params_f = one_step(False, True)
    loss_t, params_t = one_step(False, False)
    assert np.isclose(loss_fs, loss_f, rtol=1e-6), (loss_fs, loss_f)
    assert np.isclose(loss_f, loss_t, rtol=1e-6), (loss_f, loss_t)
    for tree in (params_f, params_t):
        la = jax.tree_util.tree_leaves(params_fs)
        lb = jax.tree_util.tree_leaves(tree)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )


def test_epoch_permutation_sampling():
    """Per-epoch permutation through the PUBLIC sampler API: within one
    epoch every image is visited exactly once, and epochs reshuffle (ref
    demo/train.py:127 shuffled DataLoader semantics)."""
    n, bs, size = 8, 2, 16
    steps_per_epoch = n // bs
    # n distinct constant images: pixel value identifies the source index
    vals = (np.arange(n, dtype=np.float32) + 1.0) / (n + 1.0)
    x = jnp.asarray(np.broadcast_to(vals[:, None, None, None], (n, 3, size, size)))
    cache = DeviceDataCache(
        x=x, y=x,
        heights=jnp.full((n,), size, jnp.int32),
        widths=jnp.full((n,), size, jnp.int32),
        ids=jnp.arange(n), rate=1,
    )
    key = jax.random.PRNGKey(0)
    epoch_key = jax.random.fold_in(key, 0x0E90C)

    def ids_at(step):
        xb, _ = sample_train_batch(
            cache, jax.random.fold_in(key, step), batch_size=bs,
            crop_size=size, step=jnp.asarray(step),
            steps_per_epoch=steps_per_epoch, epoch_key=epoch_key,
        )
        v = np.asarray(xb[:, 0, 0, 0])
        return np.rint(v * (n + 1.0) - 1.0).astype(int)

    seen_e0 = np.concatenate([ids_at(s) for s in range(steps_per_epoch)])
    assert sorted(seen_e0.tolist()) == list(range(n)), seen_e0
    seen_e1 = np.concatenate(
        [ids_at(s) for s in range(steps_per_epoch, 2 * steps_per_epoch)]
    )
    assert sorted(seen_e1.tolist()) == list(range(n)), seen_e1
    assert not np.array_equal(seen_e0, seen_e1)  # fresh shuffle per epoch


def test_checkpoint_roundtrip(tiny_setup, tmp_path):
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)

    def build(out_dir=None):
        model = get_model(
            kind="Proposed", architecture="Convolutional", task="deblurring",
            conv_blueprint={"scales": 2, "hidden_channels": 8}, init_input_size=32,
        )
        loss_fn = get_loss(method="supervised", physics=physics, crop_size=32)
        return Trainer(
            model=model, loss_fn=loss_fn, physics=physics, cache=cache,
            batch_size=4, epochs=2, lr=1e-3, crop_size=64,
            out_dir=out_dir, checkpoint_interval=1,
        )

    out = str(tmp_path / "run")
    t1 = build(out)
    t1.train(log_every_epoch=False)
    assert os.path.exists(os.path.join(out, "training.csv"))
    ckpts = sorted(os.listdir(os.path.join(out, "checkpoints")))
    assert len(ckpts) >= 2

    t2 = build()
    t2.load_checkpoint(os.path.join(out, "checkpoints", ckpts[-1]))
    a = jax.tree_util.tree_leaves(t1.model.params)
    b = jax.tree_util.tree_leaves(t2.model.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)


def test_eval_interval_selects_best_checkpoint(tiny_setup, tmp_path):
    """--eval_interval: periodic in-training validation writes
    validation.csv and keeps the best-PSNR state as checkpoints/ckp_best
    (mechanized operating-point selection, VERDICT r3 item 7)."""
    from sei_tpu.train.checkpoint import CheckpointManager, latest_checkpoint
    from sei_tpu.train.validate import ValidationHook

    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    model = get_model(
        kind="Proposed", architecture="Convolutional", task="deblurring",
        conv_blueprint={"scales": 2, "hidden_channels": 8}, init_input_size=32,
    )
    gt = GroundTruthDataset(
        dataset_name="single_image", size=64, memoize_gt=True,
        single_image_blueprint={"image_path": tiny_setup, "duplicates_count": 1},
    )
    hook = ValidationHook(gt, physics, model.apply_fn, pad_bucket=32)
    loss_fn = get_loss(method="supervised", physics=physics, crop_size=32)
    out = str(tmp_path / "run_eval")
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=4, epochs=4, lr=1e-3, crop_size=64,
        out_dir=out, checkpoint_interval=2,
        eval_interval=2, eval_hook=hook,
    )
    trainer.train(log_every_epoch=False)
    rows = open(os.path.join(out, "validation.csv")).read().strip().splitlines()
    assert rows[0] == "Epoch,PSNR,SSIM"
    assert len(rows) >= 3  # epochs 2, 4
    best = os.path.join(out, "checkpoints", "ckp_best")
    assert os.path.isdir(best)
    data = CheckpointManager(os.path.dirname(best)).restore(os.path.abspath(best))
    assert "params" in data and "epoch" in data
    # ckp_best must NOT be picked up as the resume point
    latest = latest_checkpoint(os.path.join(out, "checkpoints"))
    assert latest is not None and not latest.endswith("ckp_best")


def test_css_batch_swaps_pair(tiny_setup):
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    x, y = sample_train_batch(
        cache, jax.random.PRNGKey(3), batch_size=2, crop_size=32,
        css=True, physics=physics,
    )
    # css: "x" is the measurement crop, "y" its re-degradation
    assert x.shape == y.shape == (2, 3, 32, 32)
    assert not np.allclose(np.asarray(x), np.asarray(y))


@pytest.mark.slow  # the driver runs this exact path every round
def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


@pytest.mark.slow  # opt-in trainer variant
def test_scan_steps_trains_identically_shaped(tiny_setup):
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    model = get_model(
        kind="Proposed", architecture="Convolutional", task="deblurring",
        conv_blueprint={"scales": 2, "hidden_channels": 8}, init_input_size=32,
    )
    loss_fn = get_loss(method="supervised", physics=physics, crop_size=32)
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=8, epochs=4, lr=2e-3, crop_size=64, scan_steps=4,
    )
    # 8 imgs / batch 8 = 1 step per epoch -> scan clamps to gcd(4,1)=1
    assert trainer.scan_steps == 1
    trainer2 = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=2, epochs=4, lr=2e-3, crop_size=64, scan_steps=4,
    )
    assert trainer2.scan_steps == 4  # 4 steps/epoch, one dispatch per epoch
    losses = []
    trainer2.train(log_every_epoch=False,
                   on_epoch_end=lambda e, s, l: losses.append(l))
    assert len(losses) == 4 and losses[-1] < losses[0]


def test_scan_steps_numerically_identical(tiny_setup):
    """scan=K dispatches the SAME step sequence as K per-step calls.

    Each inner step derives its RNG as fold_in(base_key, state.step), so the
    stream is independent of dispatch granularity; final params must agree
    to float tolerance.  This equivalence is what justifies benchmarking at
    the scan-fused dispatch mode (bench.py BENCH_SCAN).
    """
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)

    def run(scan):
        model = get_model(
            kind="Proposed", architecture="Convolutional", task="deblurring",
            conv_blueprint={"scales": 2, "hidden_channels": 8},
            init_input_size=32,
        )
        loss_fn = get_loss(method="supervised", physics=physics, crop_size=32)
        trainer = Trainer(
            model=model, loss_fn=loss_fn, physics=physics, cache=cache,
            batch_size=2, epochs=1, lr=1e-4, crop_size=64, scan_steps=scan,
        )
        state, _ = trainer.train(log_every_epoch=False)
        return jax.device_get(trainer._params_tree(state))

    p_step, p_scan = run(1), run(4)
    jax.tree_util.tree_map(
        # atol 1e-6: XLA fuses the scan body slightly differently than the
        # standalone step, so f32-epsilon drift (~2e-7/step) is expected;
        # Adam amplifies it chaotically over long horizons, hence the short
        # 4-step horizon here — the claim is per-step graph equivalence
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6),
        p_step, p_scan,
    )


def test_sample_batch_pads_small_images_to_crop(tiny_setup):
    # reference MinSizePadding: crop larger than the image zero-pads
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics, size=48)
    x, y = sample_train_batch(
        cache, jax.random.PRNGKey(5), batch_size=2, crop_size=96
    )
    assert x.shape == (2, 3, 96, 96) and y.shape == (2, 3, 96, 96)
    # bottom-right quadrant is the zero padding
    assert float(jnp.abs(x[..., 80:, 80:]).max()) == 0.0


def test_finetuning_mask_freezes_all_but_conv_last(tiny_setup):
    """The reference fine-tunes conv_last ONLY with SGD lr 1e-2 (ref
    demo/train.py:176-188).  Regression: optax.masked passes the raw
    +gradient through to unmasked leaves unless they are explicitly zeroed,
    which silently gradient-ASCENDS every frozen param (found as an instant
    NaN blow-up in the r3ae fine-tune run)."""
    physics = get_physics(task="deblurring", kernel="Gaussian_R1", noise_level=5)
    cache = _make_cache(tiny_setup, physics)
    model = get_model(
        kind="Proposed", architecture="Transformer", task="deblurring",
        init_input_size=32,
        swinir_overrides={
            "embed_dim": 12, "depths": (2,), "num_heads": (2,),
            "window_size": 4,
        },
    )
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: any(
            getattr(p, "key", None) == "conv_last" for p in path
        ),
        model.params,
    )
    assert sum(jax.tree_util.tree_leaves(mask)) == 2  # kernel + bias
    loss_fn = get_loss(
        method="supervised", physics=physics, noise_level=5, crop_size=32
    )
    trainer = Trainer(
        model=model, loss_fn=loss_fn, physics=physics, cache=cache,
        batch_size=4, epochs=1, lr=1e-2, crop_size=64, out_dir=None,
        optimizer="SGD", trainable_mask=mask,
    )
    state = trainer.init_state()
    old_params = jax.device_get(state.params)  # before: the step donates state
    new_state, loss = trainer._get_step(0)(state, cache, trainer.base_key)
    assert np.isfinite(float(loss))
    flat_old = jax.tree_util.tree_flatten_with_path(old_params)[0]
    flat_new = dict(jax.tree_util.tree_flatten_with_path(
        jax.device_get(new_state.params))[0])
    changed = []
    for path, old in flat_old:
        new = flat_new[path]
        is_conv_last = any(getattr(p, "key", None) == "conv_last" for p in path)
        if is_conv_last:
            changed.append(not np.array_equal(old, new))
        else:
            np.testing.assert_array_equal(
                old, new, err_msg=f"frozen param changed: {jax.tree_util.keystr(path)}"
            )
    assert all(changed), "conv_last params did not update"
