"""Fused sparse decode FRONT kernel: norm1 + QKV projection (+RoPE) +
PQ encode + tile selection (+ int8 KV quantization) in ONE dispatch.

The round-5 trace (benchmarks/profile_decode.py) shows the decode step is
dominated by per-op glue: at OPT-125M B=8 ctx 2048, ~0.78 ms of the
1.17 ms device step is 250+ small XLA ops — norm stats, PQ argmin
pieces, match reduces, per-layer top_k sorts, and the per-layer KV
quantize converts. This kernel folds the whole pre-attention half of a
layer into one pallas_call.

Round-5 rewrite (v2) — the round-4 kernel required the ENTIRE code slab
and QKV weight resident in VMEM, which silently excluded every context
past ~1.1k tokens (nt > 9 at the bench shape: the round-4 "fused front"
bench rows actually ran the UNFUSED path) and every model whose QKV
exceeds VMEM. v2 streams both from HBM in double-buffered chunks, so
the envelope is now:

  * OPT (layernorm) and LLaMA (RMSNorm + RoPE) architectures
  * MHA and GQA (per-group match pooling, the decode_step contract)
  * any n_subspaces (stored code width may be sublane-padded with -2)
  * any context length / d_model (chunked streaming)
  * optional fused int8 per-token KV quantization (emits k8/v8/scales,
    replacing the two per-layer convert_reduce ops of _quantize_kv)

Numerics mirror the engine's XLA path op-for-op in the SERVING dtype
(dot -> round to dtype -> dtype bias add; f32 norm stats with dtype
affine, f32 RoPE rotation), so codes and outputs match bit-for-bit —
asserted in tests/test_decode_front.py. Tile selection reproduces
decode_step's rule exactly: group-pooled mean match over full tiles,
iterative argmax = lax.top_k tie-breaking (lowest index first), current
tile appended last.

Ref context: the reference's lookup kernel (extension/lookup.cu) rescans
all S^2 pairs per forward; here the per-token scan is O(S * n_sub) int
compares streamed at HBM speed inside one fused dispatch.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def build_pq_bd(codebook: jax.Array) -> tuple[jax.Array, jax.Array]:
    """codebook [n_sub, n_code, d_code] -> (bd [n_sub*d_code,
    n_sub*n_code] block-diagonal f32, cb_norm [1, n_sub*n_code] f32).
    Computed once per layer stack at weight-build time (vmap over the
    stacked layer axis)."""
    n_sub, n_code, d_code = codebook.shape
    cb = codebook.astype(jnp.float32)
    eye = jnp.eye(n_sub, dtype=jnp.float32)
    # bd[s*d_code + d, s2*n_code + c] = cb[s, c, d] iff s == s2
    bd = jnp.einsum('scd,st->sdtc', cb, eye).reshape(
        n_sub * d_code, n_sub * n_code)
    cb_norm = jnp.sum(cb * cb, axis=-1).reshape(1, n_sub * n_code)
    return bd, cb_norm


def rope_rot_matrix(d_head: int) -> jax.Array:
    """[d, d] f32 matrix P with x @ P == concat([-x2, x1]) (the RoPE
    rotate-half), as a matmul to avoid in-kernel concatenation (a Mosaic
    lowering hazard, docs/PERF.md round-3 notes)."""
    h = d_head // 2
    p = jnp.zeros((d_head, d_head), jnp.float32)
    p = p.at[jnp.arange(h) + h, jnp.arange(h)].set(-1.0)
    p = p.at[jnp.arange(h), jnp.arange(h) + h].set(1.0)
    return p


def _front_kernel(pos, base, *refs,
                  kv: int, heads: int, d_head: int, n_sub: int,
                  n_code: int, width: int, nt: int, nsel: int, ps: int,
                  eps: float, arch: str, quantized: bool, w_form: str,
                  n_wchunks, ntc: int, dtype):
    """refs are assembled by decode_front; static args pick the variant."""
    g = heads // kv
    rope = arch == 'llama'
    it = iter(refs)
    x_ref = next(it)
    nsc_ref = next(it)
    nbi_ref = next(it) if arch == 'opt' else None
    int8_w = w_form in ('packed_int8', 'triple_int8')
    n_wrefs = 1 if w_form in ('stack', 'packed_int8') else 3
    w_refs = [next(it) for _ in range(n_wrefs)]
    if w_form in ('stack', 'packed_int8'):
        w_refs = w_refs * 3
    s_ref = next(it) if int8_w else None    # [1, N] f32 dequant scales
    b_ref = next(it) if arch == 'opt' else None
    bd_ref = next(it)
    cbn_ref = next(it)
    posv_ref = next(it)
    cc_ref = next(it)
    cos_ref = sin_ref = rotm_ref = None
    if rope:
        cos_ref = next(it)
        sin_ref = next(it)
        rotm_ref = next(it)
    q_ref = next(it)
    k_ref = next(it)
    v_ref = next(it)
    cn_ref = next(it)
    tab_ref = next(it)
    if quantized:
        k8_ref = next(it)
        v8_ref = next(it)
        ks_ref = next(it)
        vs_ref = next(it)
    wbuf = [next(it), next(it)]
    slab = [next(it), next(it)]
    qc2 = next(it)
    kc2 = next(it)
    dall = next(it)
    tsc_ref = next(it)
    wsem = next(it)
    ssem = next(it)

    b = x_ref.shape[0]
    base0 = base[0]

    # ---- start the first code-slab chunk DMAs; matmuls hide the latency
    n_schunks = -(-nt // ntc)

    def slab_copy(i):
        c0 = i * ntc
        cw = min(ntc, nt - c0)
        return pltpu.make_async_copy(
            cc_ref.at[:, :, pl.ds(base0 + c0, cw)],
            slab[i % 2].at[:, :, pl.ds(0, cw)], ssem.at[i % 2])

    slab_copy(0).start()
    if n_schunks > 1:
        slab_copy(1).start()

    # ---- norm1: f32 stats, dtype affine (exactly engine._layernorm /
    # _rmsnorm so the dtype-rounded result matches the XLA path)
    xf = x_ref[...].astype(jnp.float32)
    if arch == 'opt':
        mu = jnp.mean(xf, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
        y = (xf - mu) * jax.lax.rsqrt(var + eps)
        hn = (y.astype(dtype) * nsc_ref[...].astype(dtype)
              + nbi_ref[...].astype(dtype))
    else:
        var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
        y = xf * jax.lax.rsqrt(var + eps)
        hn = nsc_ref[...].astype(dtype) * y.astype(dtype)

    # ---- QKV projection, streaming weight column-chunks from HBM.
    # parts: 0 = q (heads*dh cols), 1 = k, 2 = v (kv*dh each). The dot
    # rounds to the serving dtype BEFORE the dtype bias add (XLA dot
    # semantics), so projections match _qkv_proj bit-for-bit.
    part_w = [heads * d_head, kv * d_head, kv * d_head]
    out_refs = [q_ref, k_ref, v_ref]
    sched = []
    for t in range(3):
        nc = n_wchunks[t]
        # chunk width rounded UP to a lane tile: HBM memref slices must
        # be 128-aligned in offset and width (int8 tiling (8,128)(4,1) —
        # ceil(4096/7)=586 at LLaMA-7B w8 failed Mosaic lowering), and
        # ceil-div alone does not preserve that. Rounding up never
        # exceeds the wrapper's cw_max (itself a 128 multiple).
        cw = (-(-part_w[t] // nc) + 127) // 128 * 128
        for j in range(nc):
            c0 = j * cw
            if c0 < part_w[t]:
                sched.append((t, c0, min(cw, part_w[t] - c0)))

    # packed int8 stores q|k|v column-concatenated: part t's columns
    # start at the sum of the previous part widths
    part_off = [0, part_w[0], part_w[0] + part_w[1]]

    def w_copy(idx, buf):
        t, c0, cw = sched[idx]
        if w_form == 'stack':
            src = w_refs[t].at[t, :, pl.ds(c0, cw)]
        elif w_form == 'packed_int8':
            src = w_refs[t].at[:, pl.ds(part_off[t] + c0, cw)]
        else:
            src = w_refs[t].at[:, pl.ds(c0, cw)]
        return pltpu.make_async_copy(
            src, wbuf[buf].at[:, pl.ds(0, cw)], wsem.at[buf])

    w_copy(0, 0).start()
    if len(sched) > 1:
        w_copy(1, 1).start()
    for idx, (t, c0, cw) in enumerate(sched):
        w_copy(idx, idx % 2).wait()
        w = wbuf[idx % 2][:, pl.ds(0, cw)]
        if int8_w:
            # int8_matmul semantics BIT-FOR-BIT: bf16 dot with f32
            # partials accumulated per K block in ascending order
            # (skinny-m rule: block_k 256 when K%256==0 else 128), then
            # one per-output-channel scale multiply, then round to the
            # serving dtype. A single full-K dot accumulates in a
            # different order and flips bf16 near-ties downstream
            # (observed as greedy-token divergence vs the unfused
            # int8_matmul path at LLaMA-7B w8).
            dk = x_ref.shape[1]
            bk = 256 if dk % 256 == 0 else 128
            hnb = hn.astype(jnp.bfloat16)
            wb = w.astype(jnp.bfloat16)
            acc = None
            for k0 in range(0, dk, bk):
                part = jax.lax.dot_general(
                    hnb[:, k0:k0 + bk], wb[k0:k0 + bk, :],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
            # scale_in is part-concatenated for both int8 forms
            soff = part_off[t] + c0
            y = (acc * s_ref[pl.ds(0, 1), pl.ds(soff, cw)]).astype(dtype)
        else:
            y = jax.lax.dot_general(
                hn, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).astype(dtype)
        if arch == 'opt':
            y = y + b_ref[pl.ds(t, 1), pl.ds(c0, cw)].astype(dtype)
        out_refs[t][:, pl.ds(c0, cw)] = y
        # prefetch chunk idx+2 only AFTER chunk idx's buffer is consumed
        # (it reuses the same half of the double buffer)
        if idx + 2 < len(sched):
            w_copy(idx + 2, idx % 2).start()

    # ---- RoPE (LLaMA): f32 rotation of the dtype-rounded projections at
    # each slot's position, matching engine._apply_rope_1
    if rope:
        cos = cos_ref[...]                                  # [B, dh] f32
        sin = sin_ref[...]
        rotm = rotm_ref[...]                                # [dh, dh] f32
        for ref, nh in ((q_ref, heads), (k_ref, kv)):
            for h in range(nh):
                xh = ref[:, pl.ds(h * d_head, d_head)].astype(jnp.float32)
                rot = jax.lax.dot_general(
                    xh, rotm, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                ref[:, pl.ds(h * d_head, d_head)] = (
                    cos * xh + sin * rot).astype(dtype)

    # ---- fused int8 per-token KV quantization (engine._quantize_kv
    # parity: f32 of the dtype-rounded values, max-abs/127 per head,
    # round-half-even, clip +-127)
    if quantized:
        for src, dst8, dsts in ((k_ref, k8_ref, ks_ref),
                                (v_ref, v8_ref, vs_ref)):
            for h in range(kv):
                xh = src[:, pl.ds(h * d_head, d_head)].astype(jnp.float32)
                amax = jnp.max(jnp.abs(xh), axis=-1, keepdims=True)
                s = jnp.maximum(amax, 1e-8) / 127.0
                q8 = jnp.clip(jnp.round(xh / s), -127, 127)
                dst8[:, pl.ds(h * d_head, d_head)] = q8.astype(jnp.int8)
                dsts[:, pl.ds(h, 1)] = s

    # ---- PQ encode q (all heads) and k (kv heads): one dot per head
    # against the block-diag codebook, then a grouped argmin of
    # cbn - 2 z.c done per SUBSPACE over minor-dim slices (vectorized
    # across heads) — a (b, ns*nc) -> (b, ns, nc) vector reshape fails
    # Mosaic lowering when b is not a full sublane tile (seen at B=4,
    # the 7B serving batch)
    bd = bd_ref[...]                                       # [dh, ns*nc]
    cbn = cbn_ref[...]                                     # [1, ns*nc]

    def encode_all(ref, nh, dst):
        for h in range(nh):
            zh = ref[:, pl.ds(h * d_head, d_head)].astype(jnp.float32)
            dall[pl.ds(h, 1)] = jax.lax.dot_general(
                zh, bd, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)[None]
        d_all = dall[pl.ds(0, nh)]                         # [nh, B, ns*nc]
        lane = jax.lax.broadcasted_iota(jnp.int32, (nh, b, n_code), 2)
        for s in range(n_sub):
            seg = d_all[:, :, s * n_code:(s + 1) * n_code]
            score = cbn[:, s * n_code:(s + 1) * n_code][None] - 2.0 * seg
            # tie-stable argmin (lowest index, = XLA argmin): Mosaic's
            # vector argmin/argmax reduce does NOT guarantee lowest-index
            # ties (observed on-chip picking a later tied tile)
            mn = jnp.min(score, axis=-1, keepdims=True)
            idx = jnp.min(jnp.where(score <= mn, lane, n_code), axis=-1)
            dst[:, :, pl.ds(s, 1)] = idx.astype(jnp.int32)[:, :, None]

    encode_all(q_ref, heads, qc2)
    encode_all(k_ref, kv, kc2)

    cnt = jnp.transpose(kc2[...], (1, 0, 2))               # [B, kv, ns]
    if width > n_sub:
        # stored code width is sublane-padded; pad columns hold -2
        # (never matches a real code — engine._fit_codes contract).
        # Two ref stores instead of jnp.pad (minor-dim concat is a
        # Mosaic hazard)
        cn_ref[...] = jnp.full((b, kv, width), -2, jnp.int32)
        cn_ref[:, :, pl.ds(0, n_sub)] = cnt
    else:
        cn_ref[...] = cnt

    # ---- match query codes against the streamed code slab, accumulating
    # group-pooled per-tile scores (mean over group members and lanes)
    qc = jnp.transpose(qc2[...], (1, 0, 2))                # [B, H, ns]
    for i in range(n_schunks):
        c0 = i * ntc
        cw = min(ntc, nt - c0)
        slab_copy(i).wait()
        sl = slab[i % 2][:, :, pl.ds(0, cw)]               # [B,KV,cw,w,T]
        if width > n_sub:
            sl = sl[:, :, :, :n_sub]
        msum = None
        for g_ in range(g):
            # group member g_ of kv head j is query head j*g + g_
            qg = qc[:, g_::g] if g > 1 else qc             # [B, kv, ns]
            eq = (sl == qg[:, :, None, :, None]).astype(jnp.float32)
            # single-tile chunks defer BOTH reductions (see below);
            # multi-tile chunks reduce the subspace dim here
            part = eq if cw == 1 else jnp.sum(eq, axis=3)  # [B, KV, cw, T]
            msum = part if msum is None else msum + part
        if cw == 1:
            # Mosaic's reduction envelope at size-1 chunk width: a
            # single-trailing-dim reduce to a size-1 minor output
            # ([B,KV,1,T] -> [B,KV,1]) fails, and a both-trailing-dims
            # reduce to a rank-2 output ([B,KV,1,T] -(2,3)-> [B,KV])
            # fails too — but a both-trailing-dims reduce WHOSE RESULT
            # KEEPS a size-1 minor dim is the supported form. So keep
            # msum rank-5 and reduce (w, T) at once -> [B, KV, 1].
            tsc_ref[:, :, pl.ds(c0, 1)] = (
                jnp.sum(msum, axis=(3, 4)) * (1.0 / (ps * g)))
        else:
            tsc_ref[:, :, pl.ds(c0, cw)] = jnp.sum(msum, axis=-1) \
                * (1.0 / (ps * g))
        # prefetch chunk i+2 only AFTER chunk i's buffer is consumed
        if i + 2 < n_schunks:
            slab_copy(i + 2).start()

    # ---- selection: mask tiles >= cur, iterative argmax (= lax.top_k
    # tie-break order), current tile appended last (decode_step rule)
    tscore = tsc_ref[:, :, pl.ds(0, nt)]
    cur = posv_ref[...] // ps                              # [B, 1] int32
    cur3 = cur[:, :, None]                                 # [B, 1, 1]
    tile_i = jax.lax.broadcasted_iota(jnp.int32, (b, kv, nt), 2)
    tscore = jnp.where(tile_i < cur3, tscore, NEG)
    for c in range(nsel - 1):
        val = jnp.max(tscore, axis=-1, keepdims=True)      # [B, kv, 1]
        # tie-stable argmax (lowest index first = lax.top_k order);
        # Mosaic's vector argmax does not guarantee that on ties
        idx = jnp.min(jnp.where(tscore >= val, tile_i, nt), axis=-1)
        idx = idx.astype(jnp.int32)
        rel = jnp.where(val[..., 0] > NEG / 2, idx + base0, -1)
        tab_ref[:, :, pl.ds(c, 1)] = rel[:, :, None]
        tscore = jnp.where(tile_i == idx[:, :, None], NEG, tscore)
    tab_ref[:, :, pl.ds(nsel - 1, 1)] = jnp.broadcast_to(
        cur3 + base0, (b, kv, 1))


@functools.partial(
    jax.jit, static_argnames=('nt', 'nsel', 'n_sub', 'ps', 'eps', 'arch',
                              'quantized', 'interpret'))
def decode_front(x, norm_scale, norm_bias, wqkv, bqkv, bd, cb_norm,
                 c_cache, pos, base, cos=None, sin=None, *, nt: int,
                 nsel: int, n_sub: int, ps: int = 128, eps: float = 1e-5,
                 arch: str = 'opt', quantized: bool = False,
                 interpret: Optional[bool] = None):
    """One fused dispatch for the decode step's pre-attention half.

    x [B, D] -> (q [B, H*dh], k [B, KV*dh], v [B, KV*dh],
                 c_new [B, KV, w] int32,
                 tables [B, KV, nsel] PHYSICAL tile ids
                 [, k8 [B, KV*dh] i8, v8, ks [B, KV] f32, vs])

    wqkv: [3, D, D] stacked (MHA) or (wq [D, H*dh], wk [D, KV*dh], wv)
    tuple (GQA). bqkv [3, D] (OPT) or None (LLaMA, bias-free). bd /
    cb_norm from build_pq_bd. c_cache [B, KV, L*NT, w, T] int32 with
    w = stored code width >= n_sub (pad columns -2). pos [B] int32;
    base [1] int32 (layer_index * nt). cos/sin [B, d_head] f32: RoPE at
    each slot's position (LLaMA only; layers.common.rope_cos_sin).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, d = x.shape
    _, kv, _, width, t = c_cache.shape
    rope = arch == 'llama'
    scale_in = None
    if isinstance(wqkv, dict):
        # MHA int8: column-packed [D, 3D_pad] + scale [1, 3D]
        w_form = 'packed_int8'
        heads = kv
        d_head = d // kv
        w_ins = [wqkv['q']]
        scale_in = wqkv['scale'].reshape(1, -1).astype(jnp.float32)
    elif isinstance(wqkv, (tuple, list)) and isinstance(wqkv[0], dict):
        # GQA int8: separate per-part dicts
        w_form = 'triple_int8'
        wq, wk, wv = wqkv
        d_head = wk['scale'].shape[-1] // kv
        heads = wq['scale'].shape[-1] // d_head
        w_ins = [wq['q'], wk['q'], wv['q']]
        scale_in = jnp.concatenate(
            [t['scale'].reshape(-1) for t in (wq, wk, wv)]
        ).reshape(1, -1).astype(jnp.float32)
    elif isinstance(wqkv, (tuple, list)):
        w_form = 'triple'
        wq, wk, wv = wqkv
        d_head = wk.shape[1] // kv
        heads = wq.shape[1] // d_head
        w_ins = [wq, wk, wv]
    else:
        w_form = 'stack'
        heads = kv
        d_head = d // kv
        w_ins = [wqkv]
    n_code = bd.shape[1] // n_sub
    dtype = x.dtype

    # chunk policies: ~2.5 MB per double-buffered half — the scoped-VMEM
    # limit is 16 MB and Mosaic's own staging rides on top (a 4 MB
    # budget overran by ~0.3 MB at d_model 2048)
    int8_w = w_form in ('packed_int8', 'triple_int8')
    w_dtype = jnp.int8 if int8_w else dtype
    itemsize = jnp.dtype(w_dtype).itemsize
    part_w = [heads * d_head, kv * d_head, kv * d_head]
    budget = 5 * 2**19
    cw_max = max(128, (budget // (d * itemsize)) // 128 * 128)
    n_wchunks = tuple(max(1, -(-pw // cw_max)) for pw in part_w)
    # must mirror the kernel's 128-aligned chunk rounding
    cw_buf = max((-(-pw // nc) + 127) // 128 * 128
                 for pw, nc in zip(part_w, n_wchunks))
    slab_tile = b * kv * width * t * 4
    ntc = min(nt, max(1, budget // slab_tile))

    kern = functools.partial(
        _front_kernel, kv=kv, heads=heads, d_head=d_head, n_sub=n_sub,
        n_code=n_code, width=width, nt=nt, nsel=nsel, ps=ps, eps=eps,
        arch=arch, quantized=quantized, w_form=w_form,
        n_wchunks=n_wchunks, ntc=ntc, dtype=dtype)

    def vspec(*shape):
        return pl.BlockSpec(shape, lambda i, *_: (0,) * len(shape))

    hbm = pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM)
    in_specs = [vspec(b, d), vspec(1, d)]
    inputs = [x, norm_scale.reshape(1, -1)]
    if arch == 'opt':
        in_specs.append(vspec(1, d))
        inputs.append(norm_bias.reshape(1, -1))
    in_specs += [hbm] * len(w_ins)
    inputs += w_ins
    if scale_in is not None:
        in_specs.append(vspec(*scale_in.shape))
        inputs.append(scale_in)
    if arch == 'opt':
        bq = bqkv
        if bq.shape[-1] != max(part_w):     # ragged part widths (GQA)
            bq = jnp.stack([
                jnp.pad(bq[i], (0, max(part_w) - bq[i].shape[0]))
                for i in range(3)])
        in_specs.append(vspec(3, max(part_w)))
        inputs.append(bq)
    in_specs += [vspec(*bd.shape), vspec(*cb_norm.shape), vspec(b, 1), hbm]
    inputs += [bd, cb_norm, pos.reshape(-1, 1), c_cache]
    if rope:
        in_specs += [vspec(b, d_head), vspec(b, d_head),
                     vspec(d_head, d_head)]
        inputs += [cos.astype(jnp.float32), sin.astype(jnp.float32),
                   rope_rot_matrix(d_head)]

    out_specs = [vspec(b, part_w[0]), vspec(b, part_w[1]),
                 vspec(b, part_w[2]), vspec(b, kv, width),
                 vspec(b, kv, nsel)]
    out_shape = [jax.ShapeDtypeStruct((b, part_w[0]), dtype),
                 jax.ShapeDtypeStruct((b, part_w[1]), dtype),
                 jax.ShapeDtypeStruct((b, part_w[2]), dtype),
                 jax.ShapeDtypeStruct((b, kv, width), jnp.int32),
                 jax.ShapeDtypeStruct((b, kv, nsel), jnp.int32)]
    if quantized:
        out_specs += [vspec(b, part_w[1]), vspec(b, part_w[2]),
                      vspec(b, kv), vspec(b, kv)]
        out_shape += [jax.ShapeDtypeStruct((b, part_w[1]), jnp.int8),
                      jax.ShapeDtypeStruct((b, part_w[2]), jnp.int8),
                      jax.ShapeDtypeStruct((b, kv), jnp.float32),
                      jax.ShapeDtypeStruct((b, kv), jnp.float32)]

    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((d, cw_buf), w_dtype),      # weight dbl-buf
                pltpu.VMEM((d, cw_buf), w_dtype),
                pltpu.VMEM((b, kv, ntc, width, t), jnp.int32),
                pltpu.VMEM((b, kv, ntc, width, t), jnp.int32),
                pltpu.VMEM((heads, b, n_sub), jnp.int32),
                pltpu.VMEM((kv, b, n_sub), jnp.int32),
                pltpu.VMEM((heads, b, n_sub * n_code), jnp.float32),
                pltpu.VMEM((b, kv, -(-nt // ntc) * ntc), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_shape,
        interpret=interpret,
    )(pos, base, *inputs)
    return out
