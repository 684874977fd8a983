import time
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform == 'tpu'
from spt_proto_tpu.config import ModelConfig
from spt_proto_tpu.tuning import surgery
from spt_proto_tpu.tuning.trainer import (TrainState, make_optimizer,
                                          make_train_step)

base = dict(arch='opt', d_model=768, n_heads=12, n_layers=4,
            max_length=2048, vocab_size=50272, d_feedforward=3072,
            dtype=jnp.bfloat16, param_dtype=jnp.float32,
            attn_impl='pallas')
B, S, ITERS = 4, 2048, 4
r = np.random.RandomState(0)
batch = {'inputs': jnp.asarray(r.randint(0, 50272, (B, S-1)), jnp.int32)[:, :-1],
         'targets': jnp.asarray(r.randint(0, 50272, (B, S-1)), jnp.int32)[:, :-1]}

def bench(cfg, freeze, label):
    cfg.validate()
    params = surgery.init_params(cfg, jax.random.PRNGKey(0))
    tx = make_optimizer(params, freeze_base=freeze)
    trainable = None
    if freeze:
        from spt_proto_tpu.tuning.partition import trainable_mask
        trainable = trainable_mask(params)
    step = make_train_step(cfg, tx, trainable=trainable, train_quantizer=freeze)
    state = TrainState(params, tx.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def run(state, batch):
        def body(s, _):
            s, m = step(s, batch)
            return s, m['loss']
        s, losses = jax.lax.scan(body, state, None, length=ITERS)
        return losses
    np.asarray(run(state, batch))
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        np.asarray(run(state, batch))
        best = min(best, time.perf_counter() - t0)
    dt = best / ITERS
    tps = B * (S-2) / dt
    print(f'{label}: {dt*1e3:.1f} ms/step {tps:,.0f} tok/s', flush=True)
    return tps

dense = bench(ModelConfig(**base), False, 'dense full-ft')
spt = bench(ModelConfig(**base, d_lora=16, attention='sparse_v2',
                        ffn='routed', ffn_block_size=768, pq_metric='l2'),
            True, 'SPT fine-tune (sparse+LoRA)')
print(f'speedup: {spt/dense:.2f}x')
