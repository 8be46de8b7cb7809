"""Data-parallel trainer: jitted sharded train step + epoch loop.

Replaces the reference's DDP/NCCL training system
(reference python/MixtureOfExpertsDNNFastDistributed.py:483-912): instead of
one process per GPU with gradient all-reduce hooks, a single jitted train step
runs SPMD over a ``data`` mesh — per-device batches enter with a leading
device axis sharded over the mesh, loss/gradients are psum-reduced inside
``shard_map``, and the optimizer update happens on replicated parameters.
"""

from __future__ import annotations

import dataclasses
import logging
from functools import partial
from typing import Dict, Iterable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import PartitionSpec as P

from ..nn.moe import MoEAttention
from ..parallel.mesh import data_mesh
from . import loss as losses
from .checkpoint import save_checkpoint
from .schedule import cosine_warm_restarts, entropy_decay, sine_warmup_restarts

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class TrainConfig:
    lr: float = 1e-3
    min_lr: float = 0.0
    optimizer: str = "Adam"          # Adam | SGD | SGDR (SGD + cosine restarts)
    momentum: float = 0.9
    weight_decay: float = 1e-4
    t0: int = 10
    t_mult: int = 2
    warmup: bool = False
    steps_per_epoch: int = 1
    entropy_regularizer: float = 0.1
    entropy_decay: float = 0.5
    smoothing: float = 0.0
    aux_weight: float = 0.0
    class_weights: Tuple[float, float] = (1.0, 1.0)
    binary: bool = False             # BCE loss for no-ensemble models
    grad_clip_norm: float = 10.0     # 0 disables global-norm clipping
    # rematerialise the forward in the backward pass (jax.checkpoint at the
    # whole-loss boundary): measured on a v5e, a 512-site hybrid step costs
    # ~37% throughput (1.6k -> 1.0k w/s) and saves ~1 GB of the 22.3 GB a
    # 1024-site batch wants (the forward's own conv working set dominates,
    # so whole-forward remat does NOT unlock 2x batches — finer per-block
    # policies would be needed).  Off by default; headroom knob for wider
    # models / deeper read buckets.
    remat: bool = False


def make_optimizer(config: TrainConfig):
    if config.optimizer in ("SGDR",):
        schedule = cosine_warm_restarts(config.lr, config.t0, config.t_mult,
                                        config.min_lr, config.steps_per_epoch)
    elif config.warmup:
        schedule = sine_warmup_restarts(config.lr, config.t0, config.t_mult,
                                        config.min_lr, config.steps_per_epoch)
    else:
        schedule = config.lr
    if config.optimizer == "Adam":
        tx = optax.adamw(schedule, weight_decay=config.weight_decay)
    else:
        tx = optax.chain(
            optax.add_decayed_weights(config.weight_decay),
            optax.sgd(schedule, momentum=config.momentum),
        )
    if config.grad_clip_norm and config.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(config.grad_clip_norm), tx)
    return tx


def _ensure_dense(batch):
    """Expand coded-wire training batches (pipeline/compact.py) on device,
    carrying the labels through — a no-op for dense batches.  Runs inside the
    jitted step, so the 1-byte wire format cuts host->device staging ~6x and
    XLA fuses the expansion into the input conversion."""
    if "codes0" not in batch and "packed0" not in batch:
        return batch
    from ..pipeline.compact import expand_compact
    dense = dict(expand_compact({k: v for k, v in batch.items()
                                 if k != "labels"}))
    if "labels" in batch:
        dense["labels"] = batch["labels"]
    return dense


def _batch_loss(model: MoEAttention, config: TrainConfig, params, state,
                batch, reg_coeff):
    batch = _ensure_dense(batch)
    out, new_state = model.apply(params, state, batch, train=True)
    experts = out["experts"]
    if out["meta"] is None or config.binary:
        # no meta expert (single-expert or no-ensemble models): per-allele
        # binary loss over the expert logits, mirroring evaluate()'s routing
        # (the MoE posterior loss needs meta weights)
        total = losses.binary_loss(experts, batch["labels"],
                                   batch["allele_mask"])
        return total, (new_state, jnp.zeros((1,), jnp.float32))
    meta = out["meta"]
    total, per_expert, _post = losses.moe_loss(
        experts, meta, batch["labels"], batch["site_ids"], batch["allele_mask"],
        regularizer=reg_coeff, smoothing=config.smoothing,
        aux_weight=config.aux_weight, class_weights=config.class_weights,
        train=True)
    return total, (new_state, per_expert)


class Trainer:
    """Sharded data-parallel trainer.

    Batches enter as pytrees with a leading device axis of size
    ``mesh.shape['data']`` (one padded batch per device, identical shapes).
    """

    def __init__(self, model: MoEAttention, config: TrainConfig,
                 mesh=None, params=None, state=None, seed: int = 13):
        self.model = model
        self.config = config
        self.mesh = mesh if mesh is not None else data_mesh()
        if params is None:
            params, state = model.init(jax.random.PRNGKey(seed))
        self.params = params
        self.state = state or {}
        self.tx = make_optimizer(config)
        self.opt_state = self.tx.init(self.params)
        self.step = 0
        self._reg = entropy_decay(config.entropy_regularizer, config.entropy_decay)
        self._train_step = self._build_train_step()

    def _build_train_step(self):
        model, config, tx, mesh = self.model, self.config, self.tx, self.mesh

        loss_fn = _batch_loss
        if config.remat:
            # recompute the forward during backward instead of keeping its
            # activations live (see TrainConfig.remat)
            loss_fn = jax.checkpoint(
                _batch_loss, static_argnums=(0, 1))

        def per_device_grads(params, state, batch, reg_coeff):
            (total, (new_state, per_expert)), grads = jax.value_and_grad(
                lambda p: loss_fn(model, config, p, state, batch, reg_coeff),
                has_aux=True)(params)
            return total, new_state, per_expert, grads

        try:
            from jax import shard_map
            sm_kwargs = {"check_vma": False}
        except ImportError:  # jax < 0.6
            from jax.experimental.shard_map import shard_map
            sm_kwargs = {"check_rep": False}

        @partial(shard_map, mesh=mesh,
                 in_specs=(P(), P(), P("data"), P()),
                 out_specs=(P(), P(), P(), P()),
                 **sm_kwargs)
        def sharded_grads(params, state, batches, reg_coeff):
            # batches has a leading axis of size 1 on each device
            batch = jax.tree_util.tree_map(lambda x: x[0], batches)
            total, new_state, per_expert, grads = per_device_grads(
                params, state, batch, reg_coeff)
            # data-parallel reductions over ICI
            total = jax.lax.psum(total, "data")
            per_expert = jax.lax.psum(per_expert, "data")
            grads = jax.lax.psum(grads, "data")
            new_state = jax.lax.pmean(new_state, "data") if new_state else new_state
            return total, new_state, per_expert, grads

        @jax.jit
        def train_step(params, state, opt_state, batches, reg_coeff):
            total, new_state, per_expert, grads = sharded_grads(
                params, state, batches, reg_coeff)
            updates, new_opt_state = tx.update(grads, opt_state, params)
            new_params = optax.apply_updates(params, updates)
            return new_params, new_state, new_opt_state, total, per_expert

        self._sharded_grads = jax.jit(sharded_grads)
        return train_step

    def _globalize(self, device_batches):
        """Multi-host runs: each process stacks batches only for ITS
        addressable mesh devices; assemble the mesh-global sharded arrays
        (host-local numpy fed straight into the jit would be treated as an
        identical replicated input, which it is not across processes).

        Batches already staged to device arrays (``stage_batches``) pass
        through unchanged."""
        leaves = jax.tree_util.tree_leaves(device_batches)
        if leaves and isinstance(leaves[0], jax.Array):
            return device_batches
        if jax.process_count() == 1:
            return device_batches
        from jax.sharding import NamedSharding, PartitionSpec

        sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), device_batches)

    def stage_batches(self, device_batches):
        """Blocking host->device staging of a stacked batch with the train
        step's input sharding (leading axis split over the ``data`` mesh
        axis).  Called from a background thread (train/cli.prefetch_iter's
        producer) so tunnel uploads overlap the in-flight step — the
        production counterpart of the reference DDP loop's DataLoader-worker
        overlap (MixtureOfExpertsDNNFastDistributed.py:694-808); the jitted
        step then consumes committed arrays instead of paying a synchronous
        transfer at dispatch."""
        staged = self._globalize(device_batches)
        leaves = jax.tree_util.tree_leaves(staged)
        if not (leaves and isinstance(leaves[0], jax.Array)):
            from jax.sharding import NamedSharding, PartitionSpec

            staged = jax.device_put(
                staged, NamedSharding(self.mesh, PartitionSpec("data")))
        jax.block_until_ready(staged)
        return staged

    def all_ranks_have(self, flag: bool) -> bool:
        """True iff EVERY process reports ``flag`` — the per-batch barrier
        that keeps all ranks entering the psum collectives the same number
        of times per epoch (a rank that runs out of data stops everyone)."""
        if jax.process_count() == 1:
            return flag
        from jax.sharding import NamedSharding, PartitionSpec

        n_local = sum(1 for d in self.mesh.devices.flat
                      if d.process_index == jax.process_index())
        local = np.full((n_local,), 1 if flag else 0, np.int32)
        sharding = NamedSharding(self.mesh, PartitionSpec("data"))
        arr = jax.make_array_from_process_local_data(sharding, local)
        return int(jnp.min(arr)) == 1

    def compute_grads(self, device_batches):
        """Sharded (psum-reduced) loss and gradients without an optimizer
        update — used by the DP numerical-equivalence validation."""
        reg = jnp.float32(self._reg(self.step))
        total, _, _, grads = self._sharded_grads(
            self.params, self.state, self._globalize(device_batches), reg)
        return float(total), grads

    def train_batch(self, device_batches, crash_dump_prefix: str = None,
                    sync: bool = True) -> Dict[str, float]:
        """One optimisation step over per-device batches (leading axis =
        number of mesh devices).

        On a non-finite loss the offending parameters and batch are dumped
        for forensics before raising (the reference's backward-crash dump,
        MixtureOfExpertsDNNFastDistributed.py:799-806).

        ``sync=False`` returns the on-device loss array without blocking
        (jax async dispatch keeps the step in flight) — used by pipelined
        loops that overlap the next batch's host->device staging with this
        step; the caller owns syncing and the finite check."""
        reg = jnp.float32(self._reg(self.step))
        prev_params, prev_state, prev_opt = self.params, self.state, self.opt_state
        self.params, self.state, self.opt_state, total, per_expert = \
            self._train_step(self.params, self.state, self.opt_state,
                             self._globalize(device_batches), reg)
        self.step += 1
        if not sync:
            return {"loss_device": total, "per_expert_device": per_expert}
        loss = float(total)
        if not np.isfinite(loss):
            prefix = crash_dump_prefix or "/tmp/hello_tpu_crash"
            save_checkpoint(f"{prefix}.step{self.step}.err.ckpt",
                            prev_params, prev_state, prev_opt, self.step)
            import pickle
            with open(f"{prefix}.step{self.step}.payload.pkl", "wb") as fh:
                pickle.dump(jax.tree_util.tree_map(np.asarray, device_batches), fh)
            raise FloatingPointError(
                f"non-finite training loss at step {self.step}; params and "
                f"payload dumped to {prefix}.step{self.step}.*")
        return {"loss": loss,
                "per_expert": np.asarray(per_expert).tolist()}

    def unsharded_step_reference(self, device_batches):
        """Serial single-device equivalent of :meth:`train_batch` (the
        semantics the mesh psum must reproduce): per-device losses and
        gradients computed in a Python loop and summed, then the same
        optimizer update.  Does NOT mutate trainer state.

        Returns ``(total_loss, grads, leaf_scales)`` for comparison against
        :meth:`compute_grads` — the multi-chip correctness check matching
        the gradient all-reduce semantics of the reference DDP trainer
        (MixtureOfExpertsDNNFastDistributed.py:780-808).  ``leaf_scales`` is
        a tree of the max-abs per-device gradient per leaf: the right
        normaliser for comparing the sums, since the sum itself may cancel
        to near zero while each term is O(scale).
        """
        reg = jnp.float32(self._reg(self.step))
        n = jax.tree_util.tree_leaves(device_batches)[0].shape[0]
        total = 0.0
        grads_sum, scales = None, None
        for i in range(n):
            batch = jax.tree_util.tree_map(lambda x: x[i], device_batches)
            (t, _aux), g = jax.value_and_grad(
                lambda p: _batch_loss(self.model, self.config, p, self.state,
                                      batch, reg),
                has_aux=True)(self.params)
            total = total + t
            gmax = jax.tree_util.tree_map(lambda x: jnp.abs(x).max(), g)
            if grads_sum is None:
                grads_sum, scales = g, gmax
            else:
                grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum, g)
                scales = jax.tree_util.tree_map(jnp.maximum, scales, gmax)
        return float(total), grads_sum, scales

    def evaluate(self, batches: Iterable[dict]) -> float:
        """Mean validation loss over an iterable of single-device batches."""
        total, count = 0.0, 0
        for batch in batches:
            batch = _ensure_dense(batch)
            out, _ = self.model.apply(self.params, self.state, batch, train=False)
            if out["meta"] is None:
                val = losses.binary_loss(out["experts"], batch["labels"],
                                         batch["allele_mask"])
            else:
                val, _, _ = losses.moe_loss(
                    out["experts"], out["meta"], batch["labels"],
                    batch["site_ids"], batch["allele_mask"], train=False)
            total += float(val)
            count += 1
        return total / max(count, 1)

    def save(self, path: str, extra=None):
        save_checkpoint(path, self.params, self.state, self.opt_state,
                        self.step, extra)

    def restore(self, path: str):
        """Resume full training state (params, batch-norm state, optimizer
        moments, step counter) from a checkpoint.  The checkpoint's ``extra``
        dict (data-order position: epoch, batches_done, seed) is kept on
        ``self.resume_extra`` for the training loop to fast-forward the
        sampler (the reference's full-state resume,
        AlleleSearcherDNN.py:2105-2203)."""
        from .checkpoint import load_full_checkpoint

        payload = load_full_checkpoint(path)
        self.params = payload["params"]
        self.state = payload["state"] or {}
        if payload.get("opt_state") is not None:
            self.opt_state = payload["opt_state"]
        self.step = int(payload.get("step", 0))
        self.resume_extra = dict(payload.get("extra") or {})
        return self
