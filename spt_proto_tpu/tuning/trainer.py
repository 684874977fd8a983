"""Training step + loop: LoRA/sparse fine-tuning with optax under pjit.

Reference parity: script/4-sparse-tuning-0.py (AdamW lr 1e-4, weight decay
0.1, exponential LR gamma 0.9/epoch, grad clip 1.0, CE loss + 1e-2 * PQ aux
loss armed every step) and script/4-sparse-tuning-1.py (ZeRO-3 ≡ our sharded
params + optimizer state; CPU activation checkpointing ≡ cfg.remat).
Lightning's trainer shrinks to a ~50-line jitted loop.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable, Iterable, Optional

import jax
import jax.numpy as jnp
import optax

from spt_proto_tpu.config import FFN_ROUTED, ModelConfig
from spt_proto_tpu.models.decoder import DecoderLM
from spt_proto_tpu.tuning.partition import masked_optimizer

AUX_LOSS_COEFF = 1e-2  # ref 4-sparse-tuning-0.py:84-91


def _is_main() -> bool:
    from spt_proto_tpu.parallel.mesh import is_main_process
    return is_main_process()


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jax.Array


def save_train_state(path: str, state: TrainState) -> None:
    """Full training checkpoint (params + optimizer state + step) for
    crash-resume — the reference relied on Lightning ModelCheckpoint
    save_last (4-sparse-tuning-0.py:178-182). Serialized as the pytree's
    leaf list (the treedef is reconstructed from a template at load).

    Multi-host: every process participates in the gather of cross-host
    shards (a collective), but only process 0 touches the filesystem.
    """
    import os

    import numpy as np
    from spt_proto_tpu.parallel.mesh import fully_replicate, is_main_process
    state = fully_replicate(state)
    if not is_main_process():
        return
    os.makedirs(path, exist_ok=True)
    leaves = jax.tree.leaves(jax.device_get(state))
    np.savez(os.path.join(path, 'train_state.npz'),
             **{str(i): np.asarray(leaf) for i, leaf in enumerate(leaves)})


def load_train_state(path: str, template: TrainState) -> TrainState:
    """Restore into a structurally-identical template (same model config,
    optimizer, shapes)."""
    import os

    import numpy as np
    data = np.load(os.path.join(path, 'train_state.npz'))
    leaves = [data[str(i)] for i in range(len(data.files))]
    treedef = jax.tree.structure(template)
    assert treedef.num_leaves == len(leaves), \
        (treedef.num_leaves, len(leaves))
    return jax.tree.unflatten(treedef, leaves)


def make_optimizer(params: Any, *, lr: float = 1e-4,
                   weight_decay: float = 0.1, clip: float = 1.0,
                   lr_schedule: Optional[Callable] = None,
                   decay_gamma: Optional[float] = None,
                   decay_every: int = 1000,
                   freeze_base: bool = True) -> optax.GradientTransformation:
    """AdamW with clipping and base-weight freezing.

    Ref 4-sparse-tuning-0.py:46-54: AdamW lr 1e-4 wd 0.1 + ExponentialLR
    gamma 0.9 per epoch — expressed here as optax.exponential_decay every
    `decay_every` steps when decay_gamma is set.
    """
    if lr_schedule is None and decay_gamma is not None:
        lr_schedule = optax.exponential_decay(
            lr, transition_steps=decay_every, decay_rate=decay_gamma)
    tx = optax.chain(
        optax.clip_by_global_norm(clip),
        optax.adamw(lr_schedule if lr_schedule is not None else lr,
                    weight_decay=weight_decay))
    if freeze_base:
        tx = masked_optimizer(tx, params)
    return tx


def lm_loss(logits: jax.Array, targets: jax.Array,
            mask: Optional[jax.Array] = None) -> jax.Array:
    """Mean next-token cross entropy. logits [B, S, V], targets [B, S]."""
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), targets)
    if mask is None:
        return jnp.mean(ce)
    mask = mask.astype(jnp.float32)
    return jnp.sum(ce * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def make_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                    *, train_quantizer: bool = True,
                    aux_coeff: float = AUX_LOSS_COEFF,
                    dropout_rng: Optional[jax.Array] = None,
                    trainable: Optional[Any] = None,
                    accumulate: int = 1,
                    frozen8: Optional[Any] = None):
    """Returns train_step(state, batch) -> (state, metrics).

    batch = {'inputs' [B,S] int32, 'targets' [B,S] int32,
             optional 'mask' [B,S]}. With cfg.p_dropout > 0 a per-step
    dropout rng is folded from `dropout_rng` and the step counter.

    `trainable`: optional bool pytree (tuning/partition.py trainable_mask).
    When given, jax.grad differentiates ONLY the trainable leaves — XLA
    then dead-code-eliminates every frozen dW matmul from the backward
    pass, which is the actual compute saving LoRA promises (~1/3 of
    backward flops plus the embedding scatter). Frozen grads are filled
    with zeros for the (masked) optimizer.

    `accumulate=A`: gradient accumulation (the reference trains with
    Lightning accumulate_grad_batches, script/4-sparse-tuning-0.py:186).
    The batch's leading dim must be A*B; the step lax.scans A micro-
    batches of B rows, averages their grads, and applies ONE optimizer
    update — update-equivalent to a single A*B batch at 1/A the peak
    activation memory (equal-sized unmasked micro-batches make mean-of-
    means exact; with per-row masks it matches Lightning's loss-average
    semantics).
    """
    use_dropout = cfg.p_dropout > 0.0
    model = DecoderLM(cfg=cfg, deterministic=not use_dropout,
                      train_quantizer=train_quantizer)
    base_rng = dropout_rng if dropout_rng is not None \
        else jax.random.PRNGKey(0)

    flat_mask = None
    if trainable is not None:
        from spt_proto_tpu.utils.tree import flatten
        flat_mask = flatten(trainable)

    def _split(params):
        from spt_proto_tpu.utils.tree import flatten
        f = flatten(params)
        train = {k: v for k, v in f.items() if flat_mask[k]}
        frozen = {k: v for k, v in f.items() if not flat_mask[k]}
        return train, frozen

    def _merge(train_flat, frozen_flat):
        from spt_proto_tpu.utils.tree import unflatten
        return unflatten({**train_flat, **frozen_flat})

    def _forward(params, batch, step, f8):
        rngs = None
        if use_dropout:
            rngs = {'dropout': jax.random.fold_in(base_rng, step)}
        variables = {'params': params}
        if f8 is not None:
            # cfg.int8_base: the frozen int8 base kernels ride a separate
            # collection (never differentiated). Pass it to train_step as
            # the THIRD argument at scale: closed-over device trees become
            # executable CONSTANTS under jit, and a 7B frozen base (6.5 GB)
            # baked into the program breaks the remote-compile payload.
            # The make-time kwarg remains as a closure fallback for small
            # models / existing callers.
            variables['frozen8'] = f8
        out = model.apply(variables, batch['inputs'], rngs=rngs)
        ce = lm_loss(out['logits'], batch['targets'], batch.get('mask'))
        loss = ce + aux_coeff * out['pq_loss']
        return loss, {'ce': ce, 'pq_loss': out['pq_loss']}

    def grad_fn(params, batch, step, f8):
        if flat_mask is None:
            (loss, metrics), grads = jax.value_and_grad(
                _forward, has_aux=True)(params, batch, step, f8)
        else:
            train_flat, frozen_flat = _split(params)
            (loss, metrics), g_train = jax.value_and_grad(
                lambda t: _forward(_merge(t, frozen_flat), batch,
                                   step, f8), has_aux=True)(train_flat)
            zeros = {k: jnp.zeros_like(v) for k, v in frozen_flat.items()}
            grads = _merge(g_train, zeros)
        return loss, metrics, grads

    def train_step(state: TrainState, batch, frozen8_arg=None):
        f8 = frozen8_arg if frozen8_arg is not None else frozen8
        if accumulate > 1:
            # batch arrives flat [A*B, ...] (single device) or already
            # micro-shaped [A, B, ...] (mesh path: train_loop reshapes
            # host-side so the 'data' sharding rides dim 1 and every
            # micro-batch stays data-parallel)
            micro = batch if batch['inputs'].ndim == 3 else jax.tree.map(
                lambda x: x.reshape(
                    (accumulate, x.shape[0] // accumulate) + x.shape[1:]),
                batch)

            def body(acc, mb):
                out = grad_fn(state.params, mb, state.step, f8)
                return jax.tree.map(jnp.add, acc, out), None

            init = (jnp.zeros((), jnp.float32),
                    {'ce': jnp.zeros((), jnp.float32),
                     'pq_loss': jnp.zeros((), jnp.float32)},
                    jax.tree.map(
                        lambda p: jnp.zeros(p.shape, jnp.float32),
                        state.params))
            acc, _ = jax.lax.scan(body, init, micro)
            loss, metrics, grads = jax.tree.map(
                lambda x: x / accumulate, acc)
            grads = jax.tree.map(lambda g, p: g.astype(p.dtype),
                                 grads, state.params)
        else:
            loss, metrics, grads = grad_fn(state.params, batch,
                                           state.step, f8)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss,
                       grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_cp_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                       mesh, *, train_quantizer: bool = True,
                       aux_coeff: float = AUX_LOSS_COEFF):
    """Context-parallel training step (long sequences sharded over
    cfg.cp_axis; ring attention inside the layers).

    The model body runs INSIDE shard_map: every device holds the full
    (replicated) params and a [B_local, S/n_sp] sequence chunk; dense
    attention is ring attention (K/V chunks ppermute around the ring with
    online-softmax merging), positions/RoPE are offset per shard. Gradients
    are psum'd over ('data', cp_axis) so the update equals the unsharded
    step. Capability addition — the reference caps sequences at 2048 with
    no sequence parallelism at all (SURVEY §2.8/§5).

    Requires cfg.context_parallel=True; batch arrays must be sharded
    P('data', cp_axis). Base-weight freezing comes from the (masked) `tx`.
    NOTE: initialize params with the non-CP twin config
    (cfg.replace(context_parallel=False)) — model.init runs outside
    shard_map where cp_axis is unbound; param shapes are identical.
    """
    assert cfg.context_parallel, 'set cfg.context_parallel=True'
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P
    model = DecoderLM(cfg=cfg, deterministic=True,
                      train_quantizer=train_quantizer)
    axes = ('data', cfg.cp_axis)
    n_shards = mesh.shape['data'] * mesh.shape[cfg.cp_axis]

    def local_objective(params, inputs, targets):
        b, s_loc = inputs.shape
        pos = jnp.arange(s_loc) + jax.lax.axis_index(cfg.cp_axis) * s_loc
        pos = jnp.broadcast_to(pos[None], (b, s_loc))
        out = model.apply({'params': params}, inputs, positions=pos)
        ce_sum = jnp.sum(optax.softmax_cross_entropy_with_integer_labels(
            out['logits'].astype(jnp.float32), targets))
        total = jax.lax.psum(jnp.float32(targets.size), axes)
        # each term's psum-total equals the unsharded global mean
        return ce_sum / total + aux_coeff * out['pq_loss'] / n_shards, \
            (ce_sum / total, out['pq_loss'] / n_shards)

    def sharded_grads(params, inputs, targets):
        (_, (ce, pq)), grads = jax.value_and_grad(
            local_objective, has_aux=True)(params, inputs, targets)
        grads = jax.lax.psum(grads, axes)
        ce = jax.lax.psum(ce, axes)
        pq = jax.lax.psum(pq, axes)
        return grads, ce, pq

    batch_spec = P('data', cfg.cp_axis)
    mapped = jax.shard_map(
        sharded_grads, mesh=mesh,
        in_specs=(P(), batch_spec, batch_spec),
        out_specs=(P(), P(), P()))

    def train_step(state: TrainState, batch):
        grads, ce, pq = mapped(state.params, batch['inputs'],
                               batch['targets'])
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {'ce': ce, 'pq_loss': pq, 'loss': ce + aux_coeff * pq,
                   'grad_norm': optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    def batch_shardings():
        return {'inputs': NamedSharding(mesh, batch_spec),
                'targets': NamedSharding(mesh, batch_spec)}

    train_step.batch_shardings = batch_shardings
    return train_step


def make_pp_train_step(cfg: ModelConfig, tx: optax.GradientTransformation,
                       mesh, *, n_micro: int, train_quantizer: bool = True,
                       aux_coeff: float = AUX_LOSS_COEFF,
                       trainable: Optional[Any] = None):
    """Pipeline-parallel training step (GPipe schedule over the 'pipe'
    mesh axis; parallel/pipeline.py).

    The stacked-layer params are sharded P('pipe', ...) — each stage holds
    n_layers/n_pipe layers — and the batch flows through the pipeline as
    `n_micro` microbatches (lax.ppermute between stages). Embedding / final
    norm / LM head run outside the pipelined region under plain pjit
    (replicated over 'pipe', sharded over 'data'). Capability addition over
    the reference, which has no pipeline mode (SURVEY §2.8).

    Composes with DP ('data') AND TP ('model'): the pipelined region is
    manual only over ('data', 'pipe'), so the 'model' axis stays auto and
    XLA inserts the tensor-parallel collectives inside each stage from the
    params' 'model' shardings (parallel/pipeline.py module docstring).
    Requires cfg.n_layers % n_pipe == 0 and local batch % n_micro == 0.
    Use shard_params(mesh, params, pp=True) to place the params (keeps the
    'model' rules and leads with 'pipe' on the stacked-layer axis).
    """
    from flax import linen as nn

    from spt_proto_tpu.layers.common import LoRAEmbed
    from spt_proto_tpu.layers.transformer import TransformerBlock, make_norm
    from spt_proto_tpu.models.decoder import PE_OFFSET
    from spt_proto_tpu.parallel.pipeline import pipeline_blocks

    block = TransformerBlock(cfg=cfg, deterministic=True,
                             train_quantizer=train_quantizer)
    embed = LoRAEmbed(cfg.vocab_size, cfg.d_model, d_lora=cfg.d_lora,
                      dtype=cfg.dtype, param_dtype=cfg.param_dtype)
    pe = LoRAEmbed(cfg.max_length + PE_OFFSET, cfg.d_model,
                   d_lora=cfg.d_lora, dtype=cfg.dtype,
                   param_dtype=cfg.param_dtype)
    head = nn.Dense(cfg.vocab_size, use_bias=False, dtype=cfg.dtype,
                    param_dtype=cfg.param_dtype)
    final_norm = make_norm(cfg, 'final_norm')

    def block_apply(layer_params, x):
        return block.apply({'params': layer_params}, x)

    def _forward(params, batch):
        tokens = batch['inputs']
        h = embed.apply({'params': params['embedding']}, tokens)
        if cfg.arch == 'opt':
            b, s = tokens.shape
            pos = jnp.broadcast_to(jnp.arange(s)[None], (b, s))
            h = h + pe.apply({'params': params['learned_pe']},
                             pos + PE_OFFSET)
        h, aux_vec = pipeline_blocks(block_apply, params['blocks'], h,
                                     mesh=mesh, n_micro=n_micro,
                                     remat=cfg.remat)
        h = final_norm.apply({'params': params['final_norm']}, h)
        logits = head.apply({'params': params['lm_head']}, h)
        ce = lm_loss(logits, batch['targets'], batch.get('mask'))
        pq = jnp.mean(aux_vec)
        return ce + aux_coeff * pq, {'ce': ce, 'pq_loss': pq}

    flat_mask = None
    if trainable is not None:
        from spt_proto_tpu.utils.tree import flatten, unflatten
        flat_mask = flatten(trainable)

    def train_step(state: TrainState, batch):
        if flat_mask is None:
            (loss, metrics), grads = jax.value_and_grad(
                _forward, has_aux=True)(state.params, batch)
        else:
            from spt_proto_tpu.utils.tree import flatten, unflatten
            f = flatten(state.params)
            train_flat = {k: v for k, v in f.items() if flat_mask[k]}
            frozen_flat = {k: v for k, v in f.items() if not flat_mask[k]}
            (loss, metrics), g_train = jax.value_and_grad(
                lambda t: _forward(unflatten({**t, **frozen_flat}), batch),
                has_aux=True)(train_flat)
            zeros = {k: jnp.zeros_like(v) for k, v in frozen_flat.items()}
            grads = unflatten({**g_train, **zeros})
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(metrics, loss=loss,
                       grad_norm=optax.global_norm(grads))
        return TrainState(params, opt_state, state.step + 1), metrics

    return train_step


def make_eval_step(cfg: ModelConfig):
    model = DecoderLM(cfg=cfg, deterministic=True, train_quantizer=False)

    def eval_step(params, batch):
        out = model.apply({'params': params}, batch['inputs'])
        ce = lm_loss(out['logits'], batch['targets'], batch.get('mask'))
        return {'ce': ce, 'ppl': jnp.exp(ce), 'logits': out['logits']}

    return eval_step


def train_loop(cfg: ModelConfig, params: Any, batches: Iterable[dict], *,
               lr: float = 1e-4, weight_decay: float = 0.1,
               max_steps: Optional[int] = None,
               log_every: int = 10,
               log_fn: Callable[[int, dict], None] = None,
               freeze_base: bool = True,
               pq_train_every: int = 1,
               checkpoint_dir: Optional[str] = None,
               checkpoint_every: int = 500,
               resume: bool = False,
               mesh=None, fsdp: bool = False,
               pp_micro: Optional[int] = None,
               accumulate: int = 1,
               frozen8: Optional[Any] = None) -> tuple[Any, list]:
    """Training loop. With `mesh`, params/batches are placed with the
    canonical shardings and the step is jitted over the mesh.
    freeze_base=False enables full fine-tuning (no trainable masking).
    `fsdp=True` (requires mesh) additionally shards params + optimizer
    state across the 'data' axis — the reference's DeepSpeed ZeRO-3 mode
    (script/4-sparse-tuning-1.py:172-175) expressed as sharding specs.
    `pp_micro=M` (requires a mesh with a 'pipe' axis > 1) runs the GPipe
    pipeline-parallel step with M microbatches (parallel/pipeline.py).
    cfg.ffn_impl='ep' (requires mesh) dispatches routed-FFN tokens with
    expert parallelism over the 'data' axis (ops/routed_ffn_ep.py) — the
    ep_mesh trace context is entered automatically.
    cfg.context_parallel=True (requires a mesh with an 'sp' axis > 1)
    runs the context-parallel step (make_cp_train_step: sequence sharded
    over 'sp', ring attention inside the layers, params replicated); the
    batch is placed P('data', 'sp') automatically.

    Multi-host: runs unmodified under jax.distributed. Each process feeds
    its PROCESS-LOCAL batch rows (global batch = concat over processes in
    process order; put_global_batch assembles the global array), logging
    and checkpoint writes are process-0-gated, and the checkpoint save
    gathers cross-host shards collectively. See tests/test_multihost.py
    for the simulated 2-process recipe.

    accumulate=A: gradient accumulation (ref accumulate_grad_batches,
    script/4-sparse-tuning-0.py:186) — each incoming batch of A*B rows is
    processed as A micro-batches of B with one optimizer update (plain and
    FSDP steps only; the PP step already has microbatching via pp_micro).

    pq_train_every: arm the PQ codebook aux loss every K steps (the
    reference's `trigger` buffer mechanism, sparse/attention.py:98-104 —
    its training script arms it every step, but the aux loss is ~30% of
    the SPT step cost; K>1 trades codebook adaptation rate for speed).
    Two jitted step variants alternate; params/opt state are shared.
    """
    # the jitted step donates its input state; copy so the caller's param
    # arrays stay valid after training
    params = jax.tree.map(lambda x: jnp.array(x, copy=True), params)
    tx = make_optimizer(params, lr=lr, weight_decay=weight_decay,
                        freeze_base=freeze_base)
    trainable = None
    if freeze_base:
        from spt_proto_tpu.tuning.partition import trainable_mask
        trainable = trainable_mask(params)
    use_pp = pp_micro is not None and mesh is not None \
        and mesh.shape.get('pipe', 1) > 1
    use_cp = cfg.context_parallel and mesh is not None
    if mesh is not None and not use_cp:
        # CP keeps params replicated (the shard_map body holds the full
        # tree); every other mode places them with the canonical rules
        from spt_proto_tpu.parallel.sharding import (batch_sharding,
                                                     shard_params)
        params = shard_params(mesh, params, fsdp=fsdp, pp=use_pp)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))
    if resume and checkpoint_dir is not None:
        import os
        if os.path.exists(os.path.join(checkpoint_dir,
                                       'train_state.npz')):
            state = load_train_state(checkpoint_dir, state)
    import contextlib
    trace_ctx = contextlib.ExitStack()
    if cfg.ffn == FFN_ROUTED and cfg.ffn_impl == 'ep':
        assert mesh is not None, "cfg.ffn_impl='ep' requires a mesh"
        from spt_proto_tpu.ops.routed_ffn_ep import ep_mesh
        trace_ctx.enter_context(ep_mesh(mesh, axis='data'))
    if accumulate > 1:
        assert not use_cp and not use_pp, \
            'accumulate composes with the plain/FSDP step only'
    if frozen8 is not None:
        assert not use_cp and not use_pp, \
            'int8_base composes with the plain/FSDP step only'
    if use_cp:
        assert not use_pp and not fsdp, \
            'context parallelism composes with DP only (params replicated)'
        mk = lambda tq: make_cp_train_step(cfg, tx, mesh,
                                           train_quantizer=tq)
    elif use_pp:
        mk = lambda tq: make_pp_train_step(
            cfg, tx, mesh, n_micro=pp_micro, trainable=trainable,
            train_quantizer=tq)
    else:
        # frozen8 is passed at CALL time (third step argument), not
        # baked: a 7B int8 base closed over as constants is a 6.5 GB
        # compile payload (breaks remote compile) and doubles staging
        mk = lambda tq: make_train_step(cfg, tx, trainable=trainable,
                                        train_quantizer=tq,
                                        accumulate=accumulate)
    step_pq = jax.jit(mk(True), donate_argnums=(0,))
    step_fast = step_pq if pq_train_every == 1 else jax.jit(
        mk(False), donate_argnums=(0,))
    history = []
    with trace_ctx:   # ep_mesh must be live while the steps trace
        for i, batch in enumerate(batches):
            if max_steps is not None and i >= max_steps:
                break
            if mesh is not None:
                from spt_proto_tpu.parallel.mesh import put_global_batch
                if use_cp:
                    # the CP step consumes inputs/targets only
                    batch = {k: batch[k] for k in ('inputs', 'targets')}
                    batch = put_global_batch(
                        batch, step_pq.batch_shardings())
                else:
                    import numpy as np
                    from jax.sharding import NamedSharding
                    from jax.sharding import PartitionSpec as P
                    from spt_proto_tpu.parallel.sharding import \
                        batch_sharding
                    sh = batch_sharding(mesh)
                    if accumulate > 1:
                        # micro-shape host-side so 'data' shards dim 1:
                        # every micro-batch of the scan stays DP-sharded
                        batch = jax.tree.map(
                            lambda x: np.asarray(x).reshape(
                                (accumulate, -1) + np.shape(x)[1:]), batch)
                        sh = NamedSharding(mesh, P(None, 'data'))
                    batch = put_global_batch(batch, sh)
            fn = step_pq if i % pq_train_every == 0 else step_fast
            state, metrics = (fn(state, batch) if frozen8 is None
                              else fn(state, batch, frozen8))
            if i % log_every == 0:
                m = {k: float(v) for k, v in metrics.items()}
                history.append((i, m))
                if log_fn and _is_main():
                    log_fn(i, m)
            if checkpoint_dir is not None and \
                    (i + 1) % checkpoint_every == 0:
                save_train_state(checkpoint_dir, state)
    if checkpoint_dir is not None:
        save_train_state(checkpoint_dir, state)
    return state.params, history
