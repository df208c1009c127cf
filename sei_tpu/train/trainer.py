"""The training engine: one jitted, donated, mesh-sharded step.

Reference hot loop (ref demo/train.py:252-295 + SURVEY.md section 3.1): per
step, 3 SwinIR forwards + 1 backward on 48x48 crops, batch 8, with host-side
data synthesis per item.  Here the WHOLE step - batch sampling from the
HBM-resident dataset cache, aligned crops, degradation (when fresh noise is
required), the SURE+EI loss with its internal model evaluations, gradient,
and the optimizer update - is one jitted graph with donated state, and the
batch is sharded over the ``data`` mesh axis (XLA inserts the gradient
psum over ICI).

Epoch bookkeeping matches the reference: epochs x (len(dataset)//batch)
steps, per-epoch mean loss to stdout + training.csv, checkpoints at epoch 0 /
every interval / final (ref demo/train.py:191-295).
"""

from __future__ import annotations

import csv
import dataclasses
import math
import os
import time
from datetime import datetime
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from jax.sharding import NamedSharding, PartitionSpec as P

from ..data import DeviceDataCache, sample_train_batch
from ..losses.weights_distance import weights_distance_loss
from ..parallel import batch_sharding, make_mesh, replicate, replicated
from .checkpoint import CheckpointManager
from .optim import get_lr_schedule, get_optimizer


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def flat_param_fns(params):
    """(ravel, unravel) for flat-state training with a cheap transpose.

    ``jax.flatten_util.ravel_pytree``'s unravel transposes to ~one
    dynamic-update-slice kernel PER LEAF (490 tiny kernels on the SwinIR
    tree, ~1.7 ms/step on v5e); this unravel carries a custom VJP whose
    backward is ONE ``jnp.concatenate`` over the raveled cotangent leaves —
    numerically identical (same tree_flatten order as ravel_pytree, all
    leaves one dtype), one fused kernel.
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    shapes = [jnp.shape(l) for l in leaves]
    sizes = [int(np.prod(s)) if s else 1 for s in shapes]
    dtype = jnp.result_type(*leaves)
    assert all(jnp.asarray(l).dtype == dtype for l in leaves), (
        "flat-state requires a single param dtype"
    )
    offsets = np.concatenate([[0], np.cumsum(sizes)]).astype(np.int64)

    def ravel(tree):
        ls = jax.tree_util.tree_leaves(tree)
        return jnp.concatenate([jnp.ravel(l) for l in ls])

    @jax.custom_vjp
    def unravel(vec):
        return _unravel_impl(vec)

    def _unravel_impl(vec):
        outs = [
            jax.lax.slice(vec, (int(offsets[i]),), (int(offsets[i + 1]),)).reshape(
                shapes[i]
            )
            for i in range(len(leaves))
        ]
        return jax.tree_util.tree_unflatten(treedef, outs)

    def _fwd(vec):
        return _unravel_impl(vec), None

    def _bwd(_, ct_tree):
        return (ravel(ct_tree),)

    unravel.defvjp(_fwd, _bwd)
    return ravel, unravel


def _env_flag(name: str, default: bool) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return v not in ("0", "false", "False", "")


def _merge_restored(template, raw):
    """Merge an orbax raw restore (dicts/lists) into a live optax structure.

    Namedtuples come back as dicts keyed by field name, tuples as lists.
    Entries missing from the checkpoint (e.g. the schedule state when the
    resume run disables the scheduler, ref demo/train.py:213-230) keep the
    freshly initialized template value - tolerant on purpose.
    """
    if raw is None:
        return template
    if hasattr(template, "_fields"):  # namedtuple
        vals = {}
        for f in template._fields:
            r = raw.get(f) if isinstance(raw, dict) else None
            vals[f] = _merge_restored(getattr(template, f), r)
        return type(template)(**vals)
    if isinstance(template, (tuple, list)):
        if isinstance(raw, dict):  # orbax may key sequences as {'0': ...}
            raw = [raw.get(str(i)) for i in range(len(template))]
        raw = list(raw) + [None] * (len(template) - len(raw))
        merged = [
            _merge_restored(t, r) for t, r in zip(template, raw[: len(template)])
        ]
        return type(template)(merged) if isinstance(template, list) else tuple(merged)
    if isinstance(template, dict):
        return {
            k: _merge_restored(v, raw.get(k) if isinstance(raw, dict) else None)
            for k, v in template.items()
        }
    if raw is None or isinstance(raw, dict):
        return template
    arr = jnp.asarray(raw)
    return arr if arr.shape == jnp.shape(template) else template


@dataclasses.dataclass
class Trainer:
    """Owns the compiled train step and the epoch loop."""

    model: Any  # sei_tpu.models.Model
    loss_fn: Callable  # loss(key, x, y, model_apply) -> scalar
    physics: Any
    cache: DeviceDataCache
    batch_size: int = 8
    epochs: int = 500
    lr: float = 1e-4
    optimizer: str = "Adam"
    beta2: float = 0.999
    lr_scheduler_kind: str = "delayed_linear_decay"
    crop_size: int = 256  # y-side dataset crop (48 for SR, see data module)
    css: bool = False
    fresh_measurements: bool = False
    out_dir: Optional[str] = None
    checkpoint_interval: int = 50
    trainable_mask: Any = None
    weights_distance_lambda: Optional[float] = None
    base_key: jax.Array = dataclasses.field(
        default_factory=lambda: jax.random.PRNGKey(0)
    )
    mesh: Any = None
    normal_rate_losses: Optional[list] = None  # per-rate loss variants
    disable_scheduler: bool = False
    start_epoch: int = 0
    # Buffer donation and batch-sharding constraints are the right defaults
    # on real TPU slices; the axon relay (single tunneled chip) mishandles
    # donated state (observed ~70x slowdown - round-1 probes), so both are
    # auto-disabled there.  Env overrides: SEI_DONATE=0/1, SEI_CONSTRAIN=0/1.
    donate: Optional[bool] = None
    constrain_batch: Optional[bool] = None
    # Steps fused per dispatch via lax.scan (1 = one step per call).  Fusing
    # amortizes host->device dispatch latency (~3-5ms on the relay, less but
    # nonzero on direct-attached chips); losses are returned per inner step.
    scan_steps: int = 1
    # Mechanized operating-point selection: every eval_interval epochs run
    # eval_hook(params_tree) -> (psnr, ssim), append to validation.csv, and
    # checkpoint the best-PSNR state as ckp_best (the reference selects its
    # operating checkpoint by validation; on drifting synthetic-data runs
    # this replaces the post-hoc queue evals).  0 = off.
    eval_interval: int = 0
    eval_hook: Optional[Callable] = None

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh()
        on_relay = any(
            "axon" in str(getattr(d, "client", "")).lower()
            or "axon" in str(d.platform).lower()
            for d in self.mesh.devices.flat
        ) or os.environ.get("JAX_PLATFORMS", "") == "axon"
        if self.donate is None:
            self.donate = _env_flag("SEI_DONATE", not on_relay)
        if self.constrain_batch is None:
            multi = self.mesh.devices.size > 1
            self.constrain_batch = _env_flag("SEI_CONSTRAIN", multi)
        self.steps_per_epoch = max(len(self.cache) // self.batch_size, 1)
        if self.scan_steps > 1:
            # clamp so an epoch is a whole number of dispatches
            g = math.gcd(self.scan_steps, self.steps_per_epoch)
            self.scan_steps = max(g, 1)
        schedule = (
            self.lr
            if self.disable_scheduler
            else get_lr_schedule(
                self.lr_scheduler_kind, self.lr, self.epochs, self.steps_per_epoch
            )
        )
        self.tx = get_optimizer(
            kind=self.optimizer,
            lr_schedule=schedule,
            beta2=self.beta2,
            trainable_mask=self.trainable_mask,
        )
        # optional global-norm gradient clip (stability knob; the reference
        # has none, so default off - used when the SURE+EI dynamics drift
        # late in training on synthetic data)
        clip = os.environ.get("SEI_CLIP")
        if clip:
            import optax as _optax

            self.tx = _optax.chain(
                _optax.clip_by_global_norm(float(clip)), self.tx
            )
        # Flat-state training: params live as ONE raveled f32 vector between
        # steps, the gradient is taken w.r.t. that vector (the model tree is
        # rebuilt by unravel inside the traced step), and the Adam update is
        # a pure elementwise vector op.  perf_probe_r4a on the real 490-leaf
        # SwinIR tree: tree-form Adam 7.3 ms/update, optax.flatten 2.1 ms
        # (re-ravels grads every step), flat-state 0.035 ms.  Numerically
        # identical (Adam is elementwise).  Masked fine-tuning needs the
        # tree structure, so it keeps the tree form (SEI_FLAT_OPT fallback).
        self.flat_state = self.trainable_mask is None and _env_flag(
            "SEI_FLAT_STATE", True
        )
        self._unravel = None
        if not self.flat_state and self.trainable_mask is None and _env_flag(
            "SEI_FLAT_OPT", True
        ):
            self.tx = optax.flatten(self.tx)
        self._pretrained = (
            # copy=True: the frozen reference must survive even if a donated
            # step deletes the (possibly aliased) live-params buffers.
            jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), self.model.params
            )
            if self.weights_distance_lambda is not None
            else None
        )
        self._compiled = {}

    # -- state --------------------------------------------------------------
    def init_state(self) -> TrainState:
        params = self.model.params
        if self.flat_state:
            # ravel first, THEN place/replicate the single vector.  The
            # concat makes fresh buffers, so no donation-safety copy is
            # needed (except the single-leaf edge where ravel may alias).
            ravel, self._unravel = flat_param_fns(params)
            params = ravel(jax.tree_util.tree_map(jnp.asarray, params))
            if self.mesh.devices.size > 1:
                params = replicate(self.mesh, params)
            elif self.donate and len(jax.tree_util.tree_leaves(self.model.params)) == 1:
                params = jnp.array(params, copy=True)
        elif self.mesh.devices.size > 1:
            # replicate() re-materializes fresh buffers, so no donation-safety
            # copy is needed on this path.
            params = replicate(self.mesh, params)
        elif self.donate:
            # The donated step deletes the state buffers after the first
            # call.  jnp.asarray may return zero-copy ALIASES of the caller's
            # model.params (same device, same sharding), so the donation
            # would delete arrays the caller still owns - e.g. a second
            # Trainer built on the same model.  Copy once at init.
            params = jax.tree_util.tree_map(
                lambda x: jnp.array(x, copy=True), params
            )
        else:
            # Single device: do NOT commit a NamedSharding.  Semantically a
            # no-op, but the tunneled-TPU relay executes sharding-committed
            # programs ~85x slower (31.7s vs 0.37s per step, round-1 probe6).
            params = jax.tree_util.tree_map(jnp.asarray, params)
        opt_state = self.tx.init(params)
        resumed = getattr(self, "_resume_opt_state", None)
        if resumed is not None:
            opt_state = _merge_restored(opt_state, resumed)
        return TrainState(
            step=jnp.asarray(self.start_epoch * self.steps_per_epoch, jnp.int32),
            params=params,
            opt_state=opt_state,
        )

    # -- the step -----------------------------------------------------------
    def _make_step(self, loss_fn):
        bsh = batch_sharding(self.mesh)
        rep = replicated(self.mesh)

        def step_fn(state: TrainState, cache: DeviceDataCache, key: jax.Array):
            k_step = jax.random.fold_in(key, state.step)
            k_batch, k_loss, k_drop = jax.random.split(k_step, 3)
            x, y = sample_train_batch(
                cache,
                k_batch,
                batch_size=self.batch_size,
                crop_size=self.crop_size,
                css=self.css,
                physics=self.physics,
                fresh_measurements=self.fresh_measurements,
                # per-epoch permutation sampling (ref demo/train.py:127's
                # shuffled DataLoader); the epoch key must not depend on step
                step=state.step,
                steps_per_epoch=self.steps_per_epoch,
                epoch_key=jax.random.fold_in(key, 0x0E90C),
            )
            if self.constrain_batch:
                x = jax.lax.with_sharding_constraint(x, bsh)
                y = jax.lax.with_sharding_constraint(y, bsh)

            def loss_of(params_in):
                params = (
                    self._unravel(params_in) if self.flat_state else params_in
                )
                f = lambda img: self.model.apply_fn(
                    params, img, train=True, rng=k_drop
                )
                loss = loss_fn(k_loss, x, y, f)
                if self._pretrained is not None:
                    loss = loss + weights_distance_loss(
                        params, self._pretrained, self.weights_distance_lambda
                    )
                return loss

            loss, grads = jax.value_and_grad(loss_of)(state.params)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            new_state = TrainState(
                step=state.step + 1, params=params, opt_state=opt_state
            )
            return new_state, loss

        if self.scan_steps <= 1:
            return jax.jit(step_fn, donate_argnums=(0,) if self.donate else ())

        def multi_step_fn(state, cache, key):
            def body(st, _):
                return step_fn(st, cache, key)

            return jax.lax.scan(body, state, None, length=self.scan_steps)

        return jax.jit(multi_step_fn, donate_argnums=(0,) if self.donate else ())

    def _get_step(self, variant: int = 0):
        if variant not in self._compiled:
            fn = (
                self.loss_fn
                if self.normal_rate_losses is None
                else self.normal_rate_losses[variant]
            )
            self._compiled[variant] = self._make_step(fn)
        return self._compiled[variant]

    # -- the loop -----------------------------------------------------------
    def train(self, *, log_every_epoch: bool = True, on_epoch_end=None):
        state = self.init_state()
        n_variants = (
            len(self.normal_rate_losses) if self.normal_rate_losses else 1
        )
        rng = np.random.default_rng(0)

        writer = None
        ckpt = None
        if self.out_dir:
            os.makedirs(self.out_dir, exist_ok=True)
            f = open(
                os.path.join(self.out_dir, "training.csv"),
                "w",
                newline="",
                buffering=1,
            )
            writer = csv.writer(f)
            writer.writerow(["Epoch", "Training Loss"])
            ckpt = CheckpointManager(os.path.join(self.out_dir, "checkpoints"))
            ckpt.save(0, self.epochs, self._state_dict(state, epoch=0))

        val_writer = None
        if self.eval_interval and self.eval_hook is not None and self.out_dir:
            vf = open(
                os.path.join(self.out_dir, "validation.csv"),
                "w",
                newline="",
                buffering=1,
            )
            val_writer = csv.writer(vf)
            val_writer.writerow(["Epoch", "PSNR", "SSIM"])
        best_psnr = -float("inf")

        t_start = time.time()
        images_seen = 0
        for epoch in range(self.start_epoch, self.epochs):
            losses = []
            for _ in range(self.steps_per_epoch // self.scan_steps):
                variant = int(rng.integers(n_variants)) if n_variants > 1 else 0
                step_fn = self._get_step(variant)
                state, loss = step_fn(state, self.cache, self.base_key)
                losses.append(jnp.atleast_1d(loss))
                images_seen += self.batch_size * self.scan_steps
            epoch_loss = float(jnp.mean(jnp.concatenate(losses)))
            if log_every_epoch:
                ts = datetime.now().strftime("%Y-%m-%d %H:%M:%S")
                nd = len(str(self.epochs))
                print(
                    f"\t{ts}\t[{epoch + 1:{nd}d}/{self.epochs}]\t"
                    f"Training_Loss: {epoch_loss:.2e}"
                )
            if writer:
                writer.writerow([epoch + 1, epoch_loss])
            if ckpt and (
                epoch % self.checkpoint_interval == 0 or epoch == self.epochs - 1
            ):
                ckpt.save(
                    epoch + 1, self.epochs, self._state_dict(state, epoch=epoch)
                )
            if (
                self.eval_interval
                and self.eval_hook is not None
                and ((epoch + 1) % self.eval_interval == 0 or epoch == self.epochs - 1)
            ):
                psnr, ssim = self.eval_hook(self._params_tree(state))
                print(
                    f"\tValidation [{epoch + 1}/{self.epochs}] "
                    f"PSNR: {psnr:.2f} SSIM: {ssim:.4f}"
                    + (" (best)" if psnr > best_psnr else "")
                )
                if val_writer:
                    val_writer.writerow([epoch + 1, f"{psnr:.4f}", f"{ssim:.6f}"])
                if psnr > best_psnr:
                    best_psnr = psnr
                    if ckpt:
                        self._save_best(ckpt, state, epoch)
            if on_epoch_end is not None:
                on_epoch_end(epoch, state, epoch_loss)

        if ckpt:
            ckpt.wait()
        dt = time.time() - t_start
        self.model.params = jax.device_get(self._params_tree(state))
        return state, {
            "wall_time_s": dt,
            "images_per_sec": images_seen / dt if dt > 0 else 0.0,
            "steps": int(state.step),
        }

    def _save_best(self, ckpt: CheckpointManager, state: TrainState, epoch: int):
        """Overwrite checkpoints/ckp_best with the current (best-PSNR) state."""
        import shutil

        path = os.path.join(ckpt.directory, "ckp_best")
        ckpt.wait()  # let any in-flight async save settle before replacing
        if os.path.isdir(path):
            shutil.rmtree(path)
        ckpt._ckpt.save(path, self._state_dict(state, epoch=epoch), force=True)

    def _params_tree(self, state: TrainState):
        """state.params as the model tree (unravel when flat-state)."""
        if self.flat_state:
            return jax.jit(self._unravel)(state.params)
        return state.params

    def _state_dict(self, state: TrainState, *, epoch: int):
        # params are always checkpointed as the model TREE, so checkpoints
        # stay format-stable across flat/tree trainers and torch interop is
        # unaffected; the opt_state keeps its live (flat or tree) layout.
        return {
            "epoch": np.asarray(epoch),
            "params": jax.device_get(self._params_tree(state)),
            "opt_state": jax.device_get(state.opt_state),
        }

    def load_checkpoint(self, path: str):
        """RESUME support (ref demo/train.py:213-230): restores epoch/params/
        optimizer; the caller should also pin --lr and disable the schedule."""
        mgr = CheckpointManager(os.path.dirname(path) or ".")
        data = mgr.restore(os.path.abspath(path))  # raw pytree, no template
        self.start_epoch = int(data["epoch"])
        # params come back as a plain dict tree matching the flax structure
        self.model.params = jax.tree_util.tree_map(jnp.asarray, data["params"])
        self._resume_opt_state = data.get("opt_state")
        return data
