"""Fused decode-attention Pallas kernel over a tiled K/V pool.

THE decode hot path (north-star metric: output tokens/s/chip). One kernel
serves all four serving modes — contiguous/paged x dense/PQ-sparse — by
abstracting the cache as a flat pool of TOKEN-MINOR [D, page_size] tiles
(sequence on the 128-lane axis — Mosaic requires 128-aligned minor dims
for HBM tile DMAs, and D is often 64; this orientation also makes the
score matmul the natural [G, D] x [D, ps] MXU shape) plus a
per-(slot, kv-head) table of tile ids:

  * contiguous dense  : table = every tile of the slot's row, in order
  * contiguous sparse : table = top tiles by PQ match count, current last
  * paged dense/sparse: table = the slot's (selected) physical pages

Why a kernel (measured on v5e, B=8 S=2304 opt-125m shapes, see
docs/PERF.md): XLA's scan-sliced decode attention costs 4.2 ms/12 layers
because the per-layer cache slice is materialized before use, and any
jnp gather of selected tiles reads (or copies) the whole cache anyway —
sparsity cannot win inside XLA. Here the pools stay in HBM
(memory_space ANY), each grid program DMAs ONLY the tiles its table
names, and per-slot lengths bound the loop — cost tracks the actual
context and the actual sparsity.

The kernel also APPENDS the new token's K/V (and PQ codes) into the pool
before attending (input_output_aliases => in place): the column write that
cost ~1 ms/step as an XLA scatter becomes a [1, D] DMA.

Reference analog: extension/lookup.cu + sddmm/softmax/spmm pipeline
(SURVEY §2.1) — fused here into one pass, as legacy/sparse_mha.cu
attempted; the fixed-tiles-per-row contract replaces CSR.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
NBUF = 2      # tile-copy pipeline depth (outstanding DMAs per operand)


def _kernel(tables, n_tiles, last_count, write_tile, write_slot,   # SMEM
            q_ref, k_pool, v_pool, c_pool, k_new, v_new, c_new,    # in
            o_ref, k_out, v_out, c_out,                            # out
            k_scr, v_scr, c_scr, sem_k, sem_v, sem_w,              # scratch
            *, ps: int, scale: float, clamp: float, max_t: int,
            write_codes: bool):
    i = pl.program_id(0)
    g = q_ref.shape[1]
    d = q_ref.shape[2]
    nt = n_tiles[i]
    wt = write_tile[i]                # ALWAYS == tables[i, nt-1]
    ws = write_slot[i]

    # ---- append the new token's PQ codes: read-merge-write the code tile
    # (codes are not needed for the attention math itself)
    if write_codes:
        rc = pltpu.make_async_copy(c_pool.at[wt], c_scr, sem_w.at[0])
        rc.start()

    def tile_copy(t, slot):
        tid = tables[i, t]
        return (pltpu.make_async_copy(k_pool.at[tid], k_scr.at[slot],
                                      sem_k.at[slot]),
                pltpu.make_async_copy(v_pool.at[tid], v_scr.at[slot],
                                      sem_v.at[slot]))

    # deep pipelining: keep NBUF-1 tile copies in flight (the per-program
    # compute is tiny, so throughput is bounded by outstanding DMAs)
    for t0 in range(NBUF - 1):
        @pl.when(t0 < nt)
        def _prefetch(t0=t0):
            ck, cv = tile_copy(t0, t0 % NBUF)
            ck.start()
            cv.start()

    if write_codes:
        rc.wait()
        c_cols = jax.lax.broadcasted_iota(jnp.int32, c_scr.shape, 1)
        c_scr[...] = jnp.where(c_cols == ws, c_new[0], c_scr[...])
        wc = pltpu.make_async_copy(c_scr, c_out.at[wt], sem_w.at[1])
        wc.start()

    q = q_ref[0].astype(jnp.float32)                     # [G, D]
    cols = jax.lax.broadcasted_iota(jnp.int32, (d, ps), 1)

    def body(t, carry):
        m, l, acc = carry
        slot = jax.lax.rem(t, NBUF)
        ck, cv = tile_copy(t, slot)
        ck.wait()
        cv.wait()

        @pl.when(t + NBUF - 1 < nt)
        def _next():
            nxt = t + NBUF - 1
            nk, nv = tile_copy(nxt, jax.lax.rem(nxt, NBUF))
            nk.start()
            nv.start()

        is_last = t == nt - 1
        # merge the new token's K/V column into the (last) tile in VMEM:
        # the single-column HBM write Mosaic cannot express becomes a
        # masked lane select + full-tile write-back
        @pl.when(is_last)
        def _merge():
            sel = cols == ws
            k_scr[slot] = jnp.where(sel, k_new[0], k_scr[slot])
            v_scr[slot] = jnp.where(sel, v_new[0], v_scr[slot])
            wk = pltpu.make_async_copy(k_scr.at[slot], k_out.at[wt],
                                       sem_w.at[2])
            wv = pltpu.make_async_copy(v_scr.at[slot], v_out.at[wt],
                                       sem_w.at[0])
            wk.start()
            wv.start()

        k_t = k_scr[slot].astype(jnp.float32)            # [D, ps]
        v_t = v_scr[slot]                                 # [D, ps]
        s = jax.lax.dot_general(q, k_t, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale                                     # [G, ps]
        if clamp > 0.0:
            s = jnp.clip(s, -clamp, clamp)
        n_valid = jnp.where(is_last, last_count[i], ps)
        col_ok = jax.lax.broadcasted_iota(jnp.int32, (g, ps), 1) < n_valid
        s = jnp.where(col_ok, s, NEG_INF)
        m_c = jnp.max(s, axis=-1, keepdims=True)          # [G, 1]
        m_n = jnp.maximum(m, m_c)
        p = jnp.where(col_ok, jnp.exp(s - m_n), 0.0)
        alpha = jnp.exp(m - m_n)
        l_n = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p.astype(v_t.dtype), v_t,
                                 (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        return m_n, l_n, alpha * acc + pv

    m0 = jnp.full((g, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((g, 1), jnp.float32)
    a0 = jnp.zeros((g, d), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nt, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    # drain the write-back DMAs before the program ends
    if write_codes:
        pltpu.make_async_copy(c_scr, c_out.at[wt], sem_w.at[1]).wait()
    pltpu.make_async_copy(k_scr.at[0], k_out.at[wt], sem_w.at[2]).wait()
    pltpu.make_async_copy(v_scr.at[0], v_out.at[wt], sem_w.at[0]).wait()


@functools.partial(
    jax.jit,
    static_argnames=('ps', 'scale', 'clamp', 'interpret'))
def decode_attention(q: jax.Array, k_pool: jax.Array, v_pool: jax.Array,
                     c_pool: jax.Array, tables: jax.Array,
                     n_tiles: jax.Array, last_count: jax.Array,
                     k_new: jax.Array, v_new: jax.Array, c_new: jax.Array,
                     write_tile: jax.Array, write_slot: jax.Array, *,
                     ps: int, scale: float, clamp: float = 0.0,
                     interpret: Optional[bool] = None
                     ) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """One decode step of attention for BK = B * kv_heads programs.

    q [BK, G, D]; pools [P, D|n_sub, ps] (flat TOKEN-MINOR tile pools —
    tokens on the lane axis; any layout upstream);
    tables [BK, T] int32 tile ids — entries 0..n_tiles-2 are FULLY valid
    tiles, entry n_tiles-1 has `last_count` valid rows (the caller writes
    the new token into (write_tile, write_slot) and counts it there);
    k_new/v_new [BK, D]; c_new [BK, n_sub] (codes; width-1 dummy when
    dense). Returns (o [BK, G, D], k_pool', v_pool', c_pool') with the
    pools updated in place (aliased).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    bk, g, d = q.shape
    max_t = tables.shape[1]
    n_sub = c_pool.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(bk,),
        in_specs=[
            pl.BlockSpec((1, g, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, d, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, d, 1), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, n_sub, 1), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, g, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((NBUF, d, ps), k_pool.dtype),
            pltpu.VMEM((NBUF, d, ps), v_pool.dtype),
            pltpu.VMEM((n_sub, ps), c_pool.dtype),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    kernel = functools.partial(_kernel, ps=ps, scale=scale, clamp=clamp,
                               max_t=max_t, write_codes=n_sub > 1)
    k_new3 = k_new[:, :, None]   # [BK, D, 1] — the new token as a column
    v_new3 = v_new[:, :, None]
    c_new3 = c_new[:, :, None]
    o, k2, v2, c2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((bk, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_pool.shape, k_pool.dtype),
            jax.ShapeDtypeStruct(v_pool.shape, v_pool.dtype),
            jax.ShapeDtypeStruct(c_pool.shape, c_pool.dtype),
        ],
        # inputs count scalar-prefetch args first: 5 scalars, then q(5),
        # k_pool(6), v_pool(7), c_pool(8), k_new(9), v_new(10), c_new(11)
        input_output_aliases={6: 1, 7: 2, 8: 3},
        compiler_params=pltpu.CompilerParams(
            # each program reads/writes only its own slot's tiles =>
            # megacore may split the batch grid across TensorCores
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(tables, n_tiles, last_count, write_tile, write_slot,
      q, k_pool, v_pool, c_pool, k_new3, v_new3, c_new3)
    return o, k2, v2, c2


def decode_attention_ref(q, k_pool, v_pool, c_pool, tables, n_tiles,
                         last_count, k_new, v_new, c_new, write_tile,
                         write_slot, *, ps: int, scale: float,
                         clamp: float = 0.0):
    """jnp oracle with identical semantics (pool update + masked flash).
    Pools are token-minor: [P, D, ps] / [P, n_sub, ps]."""
    bk, g, d = q.shape
    upd = lambda pool, new: pool.at[write_tile, :, write_slot].set(
        new.astype(pool.dtype))
    k_pool = upd(k_pool, k_new)
    v_pool = upd(v_pool, v_new)
    c_pool = upd(c_pool, c_new)
    t_max = tables.shape[1]
    kg = k_pool[tables]                        # [BK, T, D, ps]
    vg = v_pool[tables]
    s = jnp.einsum('bgd,btdp->bgtp', q.astype(jnp.float32),
                   kg.astype(jnp.float32)) * scale
    if clamp > 0.0:
        s = jnp.clip(s, -clamp, clamp)
    t_idx = jnp.arange(t_max)[None, :, None]
    p_idx = jnp.arange(ps)[None, None, :]
    n_valid = jnp.where(t_idx == (n_tiles - 1)[:, None, None],
                        last_count[:, None, None], ps)
    ok = (t_idx < n_tiles[:, None, None]) & (p_idx < n_valid)
    s = jnp.where(ok[:, None], s, NEG_INF)
    flat = s.reshape(bk, g, -1)
    p = jax.nn.softmax(flat, axis=-1).reshape(s.shape)
    p = jnp.where(ok[:, None], p, 0.0)
    o = jnp.einsum('bgtp,btdp->bgd', p.astype(vg.dtype), vg)
    return o.astype(q.dtype), k_pool, v_pool, c_pool


# ---------------------------------------------------------------------------
# v2: tile-major kernel for the CONTIGUOUS cache (the serving hot path)
# ---------------------------------------------------------------------------
#
# Grid is (B,): one program per batch slot, looping a flattened
# (kv_head, table-entry) sequence — measured ~5 us fixed cost per grid
# program and ~2 us per strided-DMA iteration on v5e, so the cache is
# TILE-MAJOR: [B, KV, NT, D, ps] with ps=128 tokens per tile; a tile is a
# single contiguous 16 KB burst, and dense mode fetches `tps` consecutive
# tiles per DMA (64 KB supertiles). Table entries are 128-tile ids;
# iteration j covers tiles [tid, tid+tps). Per head the LAST entry's range
# must contain the write tile pos//ps; entries with id -1 are padding
# (fully masked). All heads of a slot share the write column pos[b], so
# the K/V/code column merges ride the write-tile visit in VMEM.

def _rows_kernel(tables, n_tiles, pos, tile_base,                   # SMEM
                 q_ref, k_ref, v_ref, c_ref, kn_ref, vn_ref, cn_ref,
                 tabv_ref,
                 o_ref, k_out, v_out, c_out,
                 *scratch,
                 ps: int, tps: int, t_max: int, scale: float,
                 clamp: float, write_codes: bool, kv: int,
                 sel_group: int = 1, h_chunk: int = 0):
    """Single-pass whole-slot decode attention.

    All heads' (selected) tiles are DMA'd into ONE wide VMEM buffer
    [D, KV * t_max * tps * ps] (head h owns a contiguous lane span), the
    new token's columns are merged in VMEM and written back per head, and
    the whole slot's attention is then THREE fat ops: one [KV*G, D] x
    [D, L] score matmul, one masked row softmax, one [KV*G, L] x [L, D]^T
    PV matmul. No per-tile online-softmax chains — at decode the VPU
    dependency chain, not bandwidth, is the floor (~2 us per tile visit
    measured on v5e; see docs/PERF.md).

    sel_group > 1: `sel_group` consecutive heads SHARE a table row
    (tables [B, KV/sel_group, T]); each table entry is ONE grouped DMA
    covering all its heads ([1, sel_group, tps, D, ps] contiguous in the
    cache), staged and redistributed to the packed lane layout with cheap
    in-VMEM moves, and the write-tile columns go back in ONE grouped
    write. This divides the per-tile DMA issue count — the measured
    decode floor — by sel_group. Dense tables are identical across
    heads, so dense mode runs fully grouped with unchanged semantics;
    sparse grouping pools the PQ tile selection across the group
    (cfg.sparse_select_heads — a recall/speed knob; the reference has no
    decode path at all, SURVEY §0).

    h_chunk < kv: heads are processed in kv/h_chunk sequential chunks so
    the packed buffer holds only h_chunk head-spans — required at
    flagship head counts (e.g. OPT-1.3B: 32 KV heads x 17 dense tiles
    would need 17 MB of VMEM). Each chunk DMAs, merges, attends and
    writes back independently; the per-chunk grouped-DMA width shrinks
    to g_eff = min(sel_group, h_chunk)."""
    h_chunk = h_chunk or kv
    g_eff = min(sel_group, h_chunk)
    if g_eff == 1:
        (ks_all, vs_all, c_scr, o_scr,
         sem_l, sem_wk, sem_wv, sem_c) = scratch
    else:
        (ks_all, vs_all, c_scr, o_scr, kstg, vstg, stg_wk, stg_wv,
         sem_l, sem_wk, sem_wv, sem_c, sem_stg, sem_gw) = scratch
    b = pl.program_id(0)
    g = q_ref.shape[2]
    d = q_ref.shape[3]
    n_t = n_tiles[b]                    # table entries per head (uniform)
    p_b = pos[b]
    # physical write tile: tile_base folds an outer axis (e.g. the layer)
    # into the tile id space — table entries are physical too
    w_tile = tile_base[b] + p_b // ps
    w_col = jax.lax.rem(p_b, ps)
    hspan = t_max * ps                  # lanes per head (per sub-tile u)
    lt_c = h_chunk * hspan              # packed lanes per chunk

    # ---- codes slab: read-merge-write [KV, 1, n_sub, ps] at the write
    # tile (codes are not read by the attention math; independent of the
    # head chunking)
    if write_codes:
        rc = pltpu.make_async_copy(
            c_ref.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], c_scr, sem_c)
        rc.start()
        rc.wait()
        ccols = jax.lax.broadcasted_iota(jnp.int32, c_scr.shape, 4)
        cn = cn_ref[...][:, :, None]        # (1, kv, 1, n_sub, 1)
        c_scr[...] = jnp.where(ccols == w_col, cn, c_scr[...])
        wc = pltpu.make_async_copy(
            c_scr, c_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_c)
        wc.start()

    # chunk-invariant masks / metadata
    u_w = jax.lax.rem(w_tile, tps)      # sub-tile inside the last entry
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 2)
    lane_i5 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 4)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (h_chunk * g, lt_c), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (h_chunk * g, lt_c), 0)
    own = (lane_i // hspan) == (row_i // g)
    col_in_tile = jax.lax.rem(lane_i, ps)
    e_lane = lane_i[:1] // ps
    t_lane = jax.lax.rem(e_lane, t_max)
    # vectorized per-lane table metadata (tables also arrive as a VMEM
    # tensor so the validity mask is pure vector math, not an unrolled
    # scalar loop — compile time and scalar-core work both collapse)
    tvp = tabv_ref[0]                       # [KV/sel_group, t_max]
    # load q once; chunks take value-level slices (ref-level partial
    # loads/stores on the head dim trip Mosaic at some shapes); chunk
    # outputs accumulate in the o_scr VMEM scratch
    q_full = q_ref[0].reshape(kv * g, d).astype(jnp.float32)

    for h_base in range(0, kv, h_chunk):
        # ---- stream every (head, entry) tile range of the chunk into
        # the packed buffers: chunk-local head hh = h - h_base owns lane
        # slice [(hh*t_max + t)*ps, ...+ps) with its tps consecutive
        # tiles stacked on axis 2
        if g_eff == 1:
            copies = []
            for hh in range(h_chunk):
                h = h_base + hh
                for t in range(t_max):
                    tid = jnp.maximum(tables[b, h // sel_group, t], 0)
                    lane0 = (hh * t_max + t) * ps
                    ck = pltpu.make_async_copy(
                        k_ref.at[pl.ds(b, 1), pl.ds(h, 1),
                                 pl.ds(tid, tps)],
                        ks_all.at[:, :, :, :, pl.ds(lane0, ps)], sem_l)
                    cv = pltpu.make_async_copy(
                        v_ref.at[pl.ds(b, 1), pl.ds(h, 1),
                                 pl.ds(tid, tps)],
                        vs_all.at[:, :, :, :, pl.ds(lane0, ps)], sem_l)
                    ck.start()
                    cv.start()
                    copies.append((ck, cv))
        else:
            # grouped mode: one DMA per table entry covers g_eff heads;
            # NBUF-deep staging overlaps the next DMA with redistribution
            entries = [(h_base + j * g_eff, t)
                       for j in range(h_chunk // g_eff)
                       for t in range(t_max)]

            def stg_copy(i):
                hs, t = entries[i]
                slot = i % NBUF
                tid = jnp.maximum(tables[b, hs // sel_group, t], 0)
                ck = pltpu.make_async_copy(
                    k_ref.at[pl.ds(b, 1), pl.ds(hs, g_eff),
                             pl.ds(tid, tps)],
                    kstg.at[pl.ds(slot, 1)], sem_stg.at[slot])
                cv = pltpu.make_async_copy(
                    v_ref.at[pl.ds(b, 1), pl.ds(hs, g_eff),
                             pl.ds(tid, tps)],
                    vstg.at[pl.ds(slot, 1)], sem_stg.at[slot])
                return ck, cv

            live = {}
            for i in range(min(NBUF, len(entries))):
                live[i] = stg_copy(i)
                live[i][0].start()
                live[i][1].start()

        if g_eff == 1:
            for ck, cv in copies:
                ck.wait()
                cv.wait()
        else:
            for i, (hs, t) in enumerate(entries):
                ck, cv = live.pop(i)
                ck.wait()
                cv.wait()
                slot = i % NBUF
                for hr in range(g_eff):
                    hh = (hs - h_base) + hr
                    lane0 = (hh * t_max + t) * ps
                    ks_all[:, :, :, :, pl.ds(lane0, ps)] = \
                        kstg[slot, hr][None, None]
                    vs_all[:, :, :, :, pl.ds(lane0, ps)] = \
                        vstg[slot, hr][None, None]
                nxt = i + NBUF
                if nxt < len(entries):
                    live[nxt] = stg_copy(nxt)
                    live[nxt][0].start()
                    live[nxt][1].start()

        # ---- merge the new token's K/V columns (per head, in VMEM),
        # then write the merged write-tile back to HBM
        for hh in range(h_chunk):
            h = h_base + hh
            off = (hh * t_max + n_t - 1) * ps
            kn = kn_ref[0, pl.ds(h, 1)][0]          # [D, 1]
            vn = vn_ref[0, pl.ds(h, 1)][0]
            sel = (sub_i == u_w) & (lane_i5 == w_col)
            ks_all[:, :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, kn, ks_all[:, :, :, :, pl.ds(off, ps)])
            vs_all[:, :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, vn, vs_all[:, :, :, :, pl.ds(off, ps)])
            if g_eff == 1:
                wk = pltpu.make_async_copy(
                    ks_all.at[:, :, pl.ds(u_w, 1), :, pl.ds(off, ps)],
                    k_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wk.at[h])
                wv = pltpu.make_async_copy(
                    vs_all.at[:, :, pl.ds(u_w, 1), :, pl.ds(off, ps)],
                    v_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wv.at[h])
                wk.start()
                wv.start()
            else:
                # stage the merged write-tile column block (full-KV
                # staging buffer, ABSOLUTE head index); ONE grouped
                # write-back for all heads after the chunk loop
                stg_wk[:, pl.ds(h, 1)] = ks_all[:, :, pl.ds(u_w, 1), :,
                                                pl.ds(off, ps)]
                stg_wv[:, pl.ds(h, 1)] = vs_all[:, :, pl.ds(u_w, 1), :,
                                                pl.ds(off, ps)]

        # ---- attention: per sub-tile u one fat [HC*G, D] x [D, L]
        # matmul; softmax statistics shared across the tps sub-score
        # blocks
        q_all = q_full[h_base * g:(h_base + h_chunk) * g]
        # chunk's table rows: slice the PHYSICAL table, THEN broadcast
        # to per-head rows (slicing a broadcast trips Mosaic's window
        # bounds check — the physical row dim is 1)
        r0 = h_base // sel_group
        n_r = max(1, h_chunk // sel_group)
        rep = h_chunk // n_r
        tv_c = jnp.broadcast_to(tvp[r0:r0 + n_r][:, None],
                                (n_r, rep, t_max)).reshape(h_chunk, t_max)
        tid_lane = jnp.broadcast_to(tv_c[:, :, None],
                                    (h_chunk, t_max, ps)).reshape(1, lt_c)
        scs, oks = [], []
        for u in range(tps):
            sc = jax.lax.dot_general(
                q_all, ks_all[0, 0, u].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if clamp > 0.0:
                sc = jnp.clip(sc, -clamp, clamp)
            gt = tid_lane + u
            nv = jnp.where(
                (tid_lane < 0) | (t_lane >= n_t), 0,
                jnp.where(gt == w_tile, w_col + 1,
                          jnp.where(gt < w_tile, ps, 0)))
            ok = own & (col_in_tile < nv)
            scs.append(jnp.where(ok, sc, NEG_INF))
            oks.append(ok)
        m = scs[0].max(axis=-1, keepdims=True)
        for u in range(1, tps):
            m = jnp.maximum(m, scs[u].max(axis=-1, keepdims=True))
        l = jnp.zeros_like(m)
        pv = jnp.zeros((h_chunk * g, d), jnp.float32)
        for u in range(tps):
            e = jnp.where(oks[u], jnp.exp(scs[u] - m), 0.0)
            l = l + jnp.sum(e, axis=-1, keepdims=True)
            v_all = vs_all[0, 0, u]
            pv = pv + jax.lax.dot_general(e.astype(v_all.dtype), v_all,
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        out = pv / jnp.maximum(l, 1e-30)
        if h_chunk == kv:
            o_ref[0] = out.reshape(kv, g, d).astype(o_ref.dtype)
        else:
            o_scr[pl.ds(h_base * g, h_chunk * g)] = out

        # ---- drain the chunk's write-backs before its packed buffers
        # are reloaded by the next chunk (the attention above already
        # hid the write latency)
        if g_eff == 1:
            for hh in range(h_chunk):
                h = h_base + hh
                pltpu.make_async_copy(
                    ks_all.at[:, :, pl.ds(0, 1), :, pl.ds(0, ps)],
                    k_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wk.at[h]).wait()
                pltpu.make_async_copy(
                    vs_all.at[:, :, pl.ds(0, 1), :, pl.ds(0, ps)],
                    v_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wv.at[h]).wait()
        # grouped mode stages into the full-KV buffer; the single grouped
        # write happens after the chunk loop (stg_wk is not reloaded by
        # later chunks, so no per-chunk drain is needed)

    if g_eff > 1:
        gwk = pltpu.make_async_copy(
            stg_wk, k_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_gw)
        gwv = pltpu.make_async_copy(
            stg_wv, v_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_gw)
        gwk.start()
        gwv.start()

    if h_chunk != kv:
        o_ref[0] = o_scr[...].reshape(kv, g, d).astype(o_ref.dtype)
    if g_eff > 1:
        pltpu.make_async_copy(
            stg_wk, k_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)],
            sem_gw).wait()
        pltpu.make_async_copy(
            stg_wv, v_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)],
            sem_gw).wait()

    # ---- drain the codes write-back
    if write_codes:
        pltpu.make_async_copy(
            c_scr, c_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)],
            sem_c).wait()


@functools.partial(
    jax.jit, static_argnames=('ps', 'tps', 'scale', 'clamp', 'interpret',
                              'max_vmem_mb'))
def decode_attention_rows(q, k_cache, v_cache, c_cache, tables, n_tiles,
                          pos, k_new, v_new, c_new, tile_base=None, *,
                          ps: int = 128,
                          tps: int = 1, scale: float = 1.0,
                          clamp: float = 0.0,
                          interpret: Optional[bool] = None,
                          max_vmem_mb: float = 12.0):
    """Contiguous tile-major cache decode attention + in-place append.

    q [B, KV, G, D]; caches tile-major [B, KV, NT, D, ps] (ps tokens per
    tile) / codes [B, KV, NT, n_sub, ps]; tables [B, N_TAB, T] int32 tile
    ids — N_TAB == KV for per-head tables; N_TAB < KV makes each table
    row serve KV/N_TAB consecutive heads with grouped DMAs (one per
    entry; see _rows_kernel sel_group). Iteration j covers tiles
    [tid, tid+tps) (use tps>1 with stride-tps dense tables for fat
    DMAs); -1 entries are padding (fully masked).
    Per head, the LAST entry's range must contain pos//ps (the write
    tile). n_tiles [B] = table entries per head; pos [B] = cache lengths.
    k_new/v_new [B, KV, D]; c_new [B, KV, n_sub]. Returns
    (o [B, KV, G, D], k', v', c') with caches updated in place (aliased).
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, kv, g, d = q.shape
    n_sub = c_cache.shape[3]
    t_max = tables.shape[2]
    n_tab = tables.shape[1]        # rows < kv => grouped head selection
    assert kv % n_tab == 0, (kv, n_tab)
    sel_group = kv // n_tab
    write_codes = n_sub > 1
    # head chunking: the packed buffers hold h_chunk head-spans; flagship
    # head counts (e.g. 32 KV heads x 17 dense tiles at OPT-1.3B) exceed
    # VMEM whole-slot, so heads run in sequential chunks
    h_chunk = kv
    def _mb(hc):
        return 2 * hc * t_max * tps * ps * d \
            * k_cache.dtype.itemsize / 2**20

    def _ok(hc):
        if _mb(hc) >= max_vmem_mb:
            return False
        # empirical Mosaic limit: CHUNKED kernels (hc < kv) with a packed
        # minor dim over 2^15 lanes abort tpu_compile_helper ("limits[i]
        # <= dim(i)"); whole-slot kernels at the same width compile fine
        return hc == kv or hc * t_max * tps * ps <= 2 ** 15
    while h_chunk > 1 and not _ok(h_chunk):
        # chunk size must divide kv AND nest with the selection grouping
        # (chunk table rows are an exact slice-then-broadcast)
        h_chunk = next(c for c in range(h_chunk - 1, 0, -1)
                       if kv % c == 0
                       and (c % sel_group == 0 or sel_group % c == 0))
    assert _ok(h_chunk), (
        f'packed K/V buffers need {_mb(h_chunk):.1f} MB VMEM even at one '
        f'head per chunk — reduce the table width (t_max) or tps')
    g_eff = min(sel_group, h_chunk)
    if tile_base is None:
        tile_base = jnp.zeros((b,), jnp.int32)
    scratch = [
        pltpu.VMEM((1, 1, tps, d, h_chunk * t_max * ps), k_cache.dtype),
        pltpu.VMEM((1, 1, tps, d, h_chunk * t_max * ps), v_cache.dtype),
        pltpu.VMEM((1, kv, 1, n_sub, ps), c_cache.dtype),
        pltpu.VMEM((kv * g, d), jnp.float32),   # chunked-output staging
    ]
    if g_eff > 1:
        scratch += [
            pltpu.VMEM((NBUF, g_eff, tps, d, ps), k_cache.dtype),
            pltpu.VMEM((NBUF, g_eff, tps, d, ps), v_cache.dtype),
            # full-KV write-tile staging (all chunks stage here; ONE
            # grouped write after the chunk loop)
            pltpu.VMEM((1, kv, 1, d, ps), k_cache.dtype),
            pltpu.VMEM((1, kv, 1, d, ps), v_cache.dtype),
        ]
    scratch += [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((kv,)),
        pltpu.SemaphoreType.DMA((kv,)),
        pltpu.SemaphoreType.DMA(()),
    ]
    if g_eff > 1:
        scratch += [
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(()),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kv, g, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, kv, d, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, kv, d, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, kv, n_sub, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, n_tab, t_max), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, kv, g, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_rows_kernel, ps=ps, tps=tps, t_max=t_max,
                               scale=scale, clamp=clamp,
                               write_codes=write_codes, kv=kv,
                               sel_group=sel_group, h_chunk=h_chunk)
    o, k2, v2, c2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kv, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(c_cache.shape, c_cache.dtype),
        ],
        # flattened inputs: 4 scalars, q=4, k_cache=5, v_cache=6,
        # c_cache=7, k_new=8, v_new=9, c_new=10, tables(vmem)=11
        input_output_aliases={5: 1, 6: 2, 7: 3},
        compiler_params=pltpu.CompilerParams(
            # each program reads/writes only its own slot's tiles =>
            # megacore may split the batch grid across TensorCores
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(tables, n_tiles, pos, tile_base, q, k_cache, v_cache, c_cache,
      k_new[..., None], v_new[..., None], c_new[..., None], tables)
    return o, k2, v2, c2


# ---------------------------------------------------------------------------
# v3: multi-slot single-program kernel (decode-floor attack)
# ---------------------------------------------------------------------------
#
# The (B,)-grid kernel pays its fixed cost (kernel entry, scalar
# sequencing, DMA issue+drain) once PER SLOT PER LAYER — measured ~10 us
# on v5e, which IS the decode floor at serving shapes (docs/PERF.md
# "Decode floor investigation"). This variant runs ONE grid program that
# loops the slots with DOUBLE-BUFFERED per-slot staging: slot b+1's tile
# DMAs are issued before slot b's attention math runs, so the drain time
# hides under compute, and the kernel entry is paid once per layer
# instead of B times. Same argument contract as decode_attention_rows
# (per-head tables; grouped tables are expanded by the wrapper). VMEM
# cost doubles (two slot buffers) — the wrapper asserts the fit; callers
# fall back to the grid kernel when it doesn't.

def _rows_kernel_ms(tables, n_tiles, pos, tile_base,                 # SMEM
                    q_ref, k_ref, v_ref, c_ref, kn_ref, vn_ref, cn_ref,
                    tabv_ref,
                    o_ref, k_out, v_out, c_out,
                    ks_all, vs_all, c_scr,
                    sem_l, sem_wk, sem_wv, sem_c,
                    *, ps: int, tps: int, t_max: int, scale: float,
                    clamp: float, write_codes: bool, kv: int, b_tot: int):
    g = q_ref.shape[2]
    d = q_ref.shape[3]
    hspan = t_max * ps
    ltot = kv * hspan

    def issue_reads(b, buf):
        cs = []
        for h in range(kv):
            for t in range(t_max):
                tid = jnp.maximum(tables[b, h, t], 0)
                lane0 = (h * t_max + t) * ps
                ck = pltpu.make_async_copy(
                    k_ref.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, tps)],
                    ks_all.at[pl.ds(buf, 1), :, :, :, pl.ds(lane0, ps)],
                    sem_l.at[buf])
                cv = pltpu.make_async_copy(
                    v_ref.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, tps)],
                    vs_all.at[pl.ds(buf, 1), :, :, :, pl.ds(lane0, ps)],
                    sem_l.at[buf])
                ck.start()
                cv.start()
                cs.append((ck, cv))
        return cs

    def wb_copies(b, buf):
        """Write-back copy descriptors for slot b (merged write tile)."""
        n_t = n_tiles[b]
        w_tile = tile_base[b] + pos[b] // ps
        u_w = jax.lax.rem(w_tile, tps)
        out = []
        for h in range(kv):
            off = (h * t_max + n_t - 1) * ps
            wk = pltpu.make_async_copy(
                ks_all.at[pl.ds(buf, 1), :, pl.ds(u_w, 1), :,
                          pl.ds(off, ps)],
                k_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                sem_wk.at[buf, h])
            wv = pltpu.make_async_copy(
                vs_all.at[pl.ds(buf, 1), :, pl.ds(u_w, 1), :,
                          pl.ds(off, ps)],
                v_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                sem_wv.at[buf, h])
            out.append((wk, wv))
        return out

    live = {0: issue_reads(0, 0)}
    wbs = {}
    for b in range(b_tot):
        buf = b % 2
        n_t = n_tiles[b]
        p_b = pos[b]
        w_tile = tile_base[b] + p_b // ps
        w_col = jax.lax.rem(p_b, ps)

        # codes: read-merge-write this slot's write tile (single-buffered;
        # the write drains after this slot's compute, before the next
        # slot's read reuses c_scr)
        wc = None
        if write_codes:
            rc = pltpu.make_async_copy(
                c_ref.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], c_scr, sem_c)
            rc.start()

        # before reusing this buffer for slot b+2's reads, slot b's
        # write-backs must drain (they source from the same buffer) —
        # handled below: reads for b+1 were issued into buf^1 already,
        # and b+2's reads are issued only after wbs[b] is waited.
        for ck, cv in live.pop(b):
            ck.wait()
            cv.wait()

        if write_codes:
            rc.wait()
            ccols = jax.lax.broadcasted_iota(jnp.int32, c_scr.shape, 4)
            cn = cn_ref[pl.ds(b, 1)][:, :, None]
            c_scr[...] = jnp.where(ccols == w_col, cn, c_scr[...])
            wc = pltpu.make_async_copy(
                c_scr, c_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_c)
            wc.start()

        # merge the new token's K/V column in VMEM, start write-backs
        u_w = jax.lax.rem(w_tile, tps)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 2)
        lane_i5 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 4)
        for h in range(kv):
            off = (h * t_max + n_t - 1) * ps
            kn = kn_ref[pl.ds(b, 1), pl.ds(h, 1)][0]       # [D, 1]
            vn = vn_ref[pl.ds(b, 1), pl.ds(h, 1)][0]
            sel = (sub_i == u_w) & (lane_i5 == w_col)
            ks_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, kn, ks_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)])
            vs_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, vn, vs_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)])
        wbs[b] = wb_copies(b, buf)
        for wk, wv in wbs[b]:
            wk.start()
            wv.start()

        # issue slot b+2's reads into this buffer ONLY after slot b's
        # write-backs drain (same-buffer hazard); slot b+1's reads are
        # already in flight in the other buffer
        if b + 1 < b_tot and (b + 1) not in live:
            live[b + 1] = issue_reads(b + 1, (b + 1) % 2)

        # ---- attention math for slot b (overlaps b+1's reads)
        q_all = q_ref[pl.ds(b, 1)][0].reshape(kv * g, d).astype(jnp.float32)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (kv * g, ltot), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (kv * g, ltot), 0)
        own = (lane_i // hspan) == (row_i // g)
        col_in_tile = jax.lax.rem(lane_i, ps)
        tv = tabv_ref[b]                                   # [KV, t_max]
        tid_lane = jnp.broadcast_to(tv[:, :, None],
                                    (kv, t_max, ps)).reshape(1, ltot)
        e_lane = lane_i[:1] // ps
        t_lane = jax.lax.rem(e_lane, t_max)
        scs, oks = [], []
        for u in range(tps):
            sc = jax.lax.dot_general(
                q_all, ks_all[buf, 0, u].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            if clamp > 0.0:
                sc = jnp.clip(sc, -clamp, clamp)
            gt = tid_lane + u
            nv = jnp.where(
                (tid_lane < 0) | (t_lane >= n_t), 0,
                jnp.where(gt == w_tile, w_col + 1,
                          jnp.where(gt < w_tile, ps, 0)))
            ok = own & (col_in_tile < nv)
            scs.append(jnp.where(ok, sc, NEG_INF))
            oks.append(ok)
        m = scs[0].max(axis=-1, keepdims=True)
        for u in range(1, tps):
            m = jnp.maximum(m, scs[u].max(axis=-1, keepdims=True))
        lsum = jnp.zeros_like(m)
        pv = jnp.zeros((kv * g, d), jnp.float32)
        for u in range(tps):
            e = jnp.where(oks[u], jnp.exp(scs[u] - m), 0.0)
            lsum = lsum + jnp.sum(e, axis=-1, keepdims=True)
            v_all = vs_all[buf, 0, u]
            pv = pv + jax.lax.dot_general(e.astype(v_all.dtype), v_all,
                                          (((1,), (1,)), ((), ())),
                                          preferred_element_type=jnp.float32)
        out = pv / jnp.maximum(lsum, 1e-30)
        o_ref[pl.ds(b, 1)] = out.reshape(1, kv, g, d).astype(o_ref.dtype)

        # drain slot b's write-backs, then issue b+2's reads into buf
        if wc is not None:
            wc.wait()
        for wk, wv in wbs.pop(b):
            wk.wait()
            wv.wait()
        if b + 2 < b_tot:
            live[b + 2] = issue_reads(b + 2, buf)


@functools.partial(
    jax.jit, static_argnames=('ps', 'tps', 'scale', 'clamp', 'interpret'))
def decode_attention_rows_ms(q, k_cache, v_cache, c_cache, tables, n_tiles,
                             pos, k_new, v_new, c_new, tile_base=None, *,
                             ps: int = 128, tps: int = 1, scale: float = 1.0,
                             clamp: float = 0.0,
                             interpret: Optional[bool] = None):
    """Multi-slot twin of decode_attention_rows (same contract/semantics).

    One grid program loops all B slots with double-buffered staging —
    the per-slot kernel-entry cost is paid once per layer and slot b+1's
    tile DMAs overlap slot b's math. Grouped tables ([B, N_TAB < KV, T])
    are expanded to per-head here. Use when 2x the per-slot staging fits
    VMEM (the wrapper asserts); otherwise call decode_attention_rows.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, kv, g, d = q.shape
    n_sub = c_cache.shape[3]
    t_max = tables.shape[2]
    if tables.shape[1] != kv:
        tables = jnp.repeat(tables, kv // tables.shape[1], axis=1)
    write_codes = n_sub > 1
    vmem_mb = 2 * 2 * kv * t_max * tps * ps * d * k_cache.dtype.itemsize \
        / 2**20
    assert vmem_mb < 11, (
        f'double-buffered packed K/V needs {vmem_mb:.1f} MB VMEM — use '
        f'decode_attention_rows (single-buffer grid kernel) instead')
    if tile_base is None:
        tile_base = jnp.zeros((b,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kv, g, d), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((b, kv, d, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, kv, d, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, kv, n_sub, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, kv, t_max), lambda i, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, kv, g, d), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, tps, d, kv * t_max * ps), k_cache.dtype),
            pltpu.VMEM((2, 1, tps, d, kv * t_max * ps), v_cache.dtype),
            pltpu.VMEM((1, kv, 1, n_sub, ps), c_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, kv)),
            pltpu.SemaphoreType.DMA((2, kv)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(_rows_kernel_ms, ps=ps, tps=tps, t_max=t_max,
                               scale=scale, clamp=clamp,
                               write_codes=write_codes, kv=kv, b_tot=b)
    o, k2, v2, c2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kv, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(c_cache.shape, c_cache.dtype),
        ],
        # flattened inputs: 4 scalars, q=4, k_cache=5, v_cache=6,
        # c_cache=7, k_new=8, v_new=9, c_new=10, tables(vmem)=11
        input_output_aliases={5: 1, 6: 2, 7: 3},
        interpret=interpret,
    )(tables, n_tiles, pos, tile_base, q, k_cache, v_cache, c_cache,
      k_new[..., None], v_new[..., None], c_new[..., None], tables)
    return o, k2, v2, c2


# ---------------------------------------------------------------------------
# int8-quantized variant of the tile-major kernel (ROADMAP 8)
# ---------------------------------------------------------------------------
#
# K/V tiles are int8 with a PER-TOKEN f32 scale kept in parallel scale
# pools [B, KV, NT, 1, ps] (one scale per lane/token per head — the
# finest granularity that never needs requantization on append, unlike
# per-tile scales which would have to rescale frozen int8 data when a new
# outlier token lands in the write tile). HBM traffic for the decode
# bottleneck (K/V reads) halves vs bf16: 16 KB + 0.5 KB per tile vs
# 32 KB. Dequantization folds into the existing math for free:
#     scores = (q @ k8) * kscale_lane        (post-matmul row scale)
#     pv     = (p * vscale_lane) @ v8        (fold into the probs)
# so the MXU still sees one matmul per sub-tile and the softmax
# statistics (m, l) are computed on true scores/probs.

def _rows_kernel_q(tables, n_tiles, pos, tile_base,                 # SMEM
                   q_ref, k_ref, v_ref, c_ref, ksc_ref, vsc_ref,
                   kn_ref, vn_ref, cn_ref, kscn_ref, vscn_ref,
                   tabv_ref,
                   o_ref, k_out, v_out, c_out, ksc_out, vsc_out,
                   *scratch,
                   ps: int, tps: int, t_max: int, nt_layer: int,
                   scale: float, clamp: float, write_codes: bool,
                   kv: int, sel_group: int = 1, h_chunk: int = 0):
    """Quantized twin of _rows_kernel — including its sel_group grouped
    DMAs and h_chunk head chunking (round-4 port; the round-3 kernel was
    whole-slot per-head only, which is why int8 lost 30% at OPT-2.7B's
    kv=32 shapes, docs/PERF.md).

    The per-token scales do NOT ride per-tile DMAs (measured: doubling
    the DMA issue count erased the bandwidth win — the per-tile-visit
    fixed cost is the decode floor). Instead the WHOLE layer-slab of
    scales for this slot ([1, nt_layer, KV_pad, ps], a few tens of KB)
    arrives in ONE strided copy per operand, the table's lanes are packed
    into [tps, chunk lanes] line buffers with unrolled VMEM moves (cheap
    VPU work), and the merged write-tile scale goes back with one strided
    write per operand. Net extra DMAs per program: 2 reads + 2 writes."""
    h_chunk = h_chunk or kv
    g_eff = min(sel_group, h_chunk)
    if g_eff == 1:
        (ks_all, vs_all, kslab, vslab, kss_line, vss_line, c_scr, o_scr,
         sem_l, sem_wk, sem_wv, sem_c, sem_s) = scratch
    else:
        (ks_all, vs_all, kslab, vslab, kss_line, vss_line, c_scr, o_scr,
         kstg, vstg, stg_wk, stg_wv,
         sem_l, sem_wk, sem_wv, sem_c, sem_s, sem_stg, sem_gw) = scratch
    b = pl.program_id(0)
    g = q_ref.shape[2]
    d = q_ref.shape[3]
    n_t = n_tiles[b]
    p_b = pos[b]
    base = tile_base[b]
    w_tile = base + p_b // ps
    w_col = jax.lax.rem(p_b, ps)
    hspan = t_max * ps
    lt_c = h_chunk * hspan

    # ---- scale slabs: one strided DMA each (nt_layer tiles x kv rows)
    rks = pltpu.make_async_copy(
        ksc_ref.at[pl.ds(b, 1), pl.ds(base, nt_layer)], kslab, sem_s)
    rvs = pltpu.make_async_copy(
        vsc_ref.at[pl.ds(b, 1), pl.ds(base, nt_layer)], vslab, sem_s)
    rks.start()
    rvs.start()

    # ---- codes slab: read-merge-write at the write tile
    if write_codes:
        rc = pltpu.make_async_copy(
            c_ref.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], c_scr, sem_c)
        rc.start()
        rc.wait()
        ccols = jax.lax.broadcasted_iota(jnp.int32, c_scr.shape, 4)
        cn = cn_ref[...][:, :, None]
        c_scr[...] = jnp.where(ccols == w_col, cn, c_scr[...])
        wc = pltpu.make_async_copy(
            c_scr, c_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_c)
        wc.start()

    rks.wait()
    rvs.wait()
    # merge the new token's scales into the slabs, write the write-tile
    # scale rows back (one strided copy per operand)
    rel_w = w_tile - base
    slab_t = jax.lax.broadcasted_iota(jnp.int32, kslab.shape, 1)
    slab_l = jax.lax.broadcasted_iota(jnp.int32, kslab.shape, 3)
    sel_s = (slab_t == rel_w) & (slab_l == w_col)
    kslab[...] = jnp.where(sel_s, kscn_ref[...], kslab[...])
    vslab[...] = jnp.where(sel_s, vscn_ref[...], vslab[...])
    wks = pltpu.make_async_copy(
        kslab.at[:, pl.ds(rel_w, 1)],
        ksc_out.at[pl.ds(b, 1), pl.ds(w_tile, 1)], sem_s)
    wvs = pltpu.make_async_copy(
        vslab.at[:, pl.ds(rel_w, 1)],
        vsc_out.at[pl.ds(b, 1), pl.ds(w_tile, 1)], sem_s)
    wks.start()
    wvs.start()

    # chunk-invariant masks / metadata
    u_w = jax.lax.rem(w_tile, tps)
    sub_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 2)
    lane_i5 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 4)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (h_chunk * g, lt_c), 1)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (h_chunk * g, lt_c), 0)
    own = (lane_i // hspan) == (row_i // g)
    col_in_tile = jax.lax.rem(lane_i, ps)
    e_lane = lane_i[:1] // ps
    t_lane = jax.lax.rem(e_lane, t_max)
    tvp = tabv_ref[0]                       # [KV/sel_group, t_max]
    q_full = q_ref[0].reshape(kv * g, d).astype(jnp.float32)

    for h_base in range(0, kv, h_chunk):
        # ---- stream the chunk's tiles into the packed buffers
        if g_eff == 1:
            copies = []
            for hh in range(h_chunk):
                h = h_base + hh
                for t in range(t_max):
                    tid = jnp.maximum(tables[b, h // sel_group, t], 0)
                    lane0 = (hh * t_max + t) * ps
                    ck = pltpu.make_async_copy(
                        k_ref.at[pl.ds(b, 1), pl.ds(h, 1),
                                 pl.ds(tid, tps)],
                        ks_all.at[:, :, :, :, pl.ds(lane0, ps)], sem_l)
                    cv = pltpu.make_async_copy(
                        v_ref.at[pl.ds(b, 1), pl.ds(h, 1),
                                 pl.ds(tid, tps)],
                        vs_all.at[:, :, :, :, pl.ds(lane0, ps)], sem_l)
                    ck.start()
                    cv.start()
                    copies.append((ck, cv))
        else:
            entries = [(h_base + j * g_eff, t)
                       for j in range(h_chunk // g_eff)
                       for t in range(t_max)]

            def stg_copy(i):
                hs, t = entries[i]
                slot = i % NBUF
                tid = jnp.maximum(tables[b, hs // sel_group, t], 0)
                ck = pltpu.make_async_copy(
                    k_ref.at[pl.ds(b, 1), pl.ds(hs, g_eff),
                             pl.ds(tid, tps)],
                    kstg.at[pl.ds(slot, 1)], sem_stg.at[slot])
                cv = pltpu.make_async_copy(
                    v_ref.at[pl.ds(b, 1), pl.ds(hs, g_eff),
                             pl.ds(tid, tps)],
                    vstg.at[pl.ds(slot, 1)], sem_stg.at[slot])
                return ck, cv

            live = {}
            for i in range(min(NBUF, len(entries))):
                live[i] = stg_copy(i)
                live[i][0].start()
                live[i][1].start()

        # ---- pack the chunk's scale lanes into [tps, lt_c] line
        # buffers (unrolled VMEM moves; overlaps the tile DMAs)
        for hh in range(h_chunk):
            h = h_base + hh
            for t in range(t_max):
                rel = jnp.clip(tables[b, h // sel_group, t] - base, 0,
                               nt_layer - tps)
                lane0 = (hh * t_max + t) * ps
                for u in range(tps):
                    kss_line[pl.ds(u, 1), pl.ds(lane0, ps)] = \
                        kslab[0, pl.ds(rel + u, 1), h]
                    vss_line[pl.ds(u, 1), pl.ds(lane0, ps)] = \
                        vslab[0, pl.ds(rel + u, 1), h]

        if g_eff == 1:
            for ck, cv in copies:
                ck.wait()
                cv.wait()
        else:
            for i, (hs, t) in enumerate(entries):
                ck, cv = live.pop(i)
                ck.wait()
                cv.wait()
                slot = i % NBUF
                for hr in range(g_eff):
                    hh = (hs - h_base) + hr
                    lane0 = (hh * t_max + t) * ps
                    ks_all[:, :, :, :, pl.ds(lane0, ps)] = \
                        kstg[slot, hr][None, None]
                    vs_all[:, :, :, :, pl.ds(lane0, ps)] = \
                        vstg[slot, hr][None, None]
                nxt = i + NBUF
                if nxt < len(entries):
                    live[nxt] = stg_copy(nxt)
                    live[nxt][0].start()
                    live[nxt][1].start()

        # ---- merge the new token's int8 K/V columns, write back
        for hh in range(h_chunk):
            h = h_base + hh
            off = (hh * t_max + n_t - 1) * ps
            kn = kn_ref[0, pl.ds(h, 1)][0]
            vn = vn_ref[0, pl.ds(h, 1)][0]
            sel = (sub_i == u_w) & (lane_i5 == w_col)
            ks_all[:, :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, kn, ks_all[:, :, :, :, pl.ds(off, ps)])
            vs_all[:, :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, vn, vs_all[:, :, :, :, pl.ds(off, ps)])
            if g_eff == 1:
                wk = pltpu.make_async_copy(
                    ks_all.at[:, :, pl.ds(u_w, 1), :, pl.ds(off, ps)],
                    k_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wk.at[h])
                wv = pltpu.make_async_copy(
                    vs_all.at[:, :, pl.ds(u_w, 1), :, pl.ds(off, ps)],
                    v_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wv.at[h])
                wk.start()
                wv.start()
            else:
                stg_wk[:, pl.ds(h, 1)] = ks_all[:, :, pl.ds(u_w, 1), :,
                                                pl.ds(off, ps)]
                stg_wv[:, pl.ds(h, 1)] = vs_all[:, :, pl.ds(u_w, 1), :,
                                                pl.ds(off, ps)]

        # ---- attention with dequant folded in (scores x k-scale lane,
        # probs x v-scale lane before PV)
        q_all = q_full[h_base * g:(h_base + h_chunk) * g]
        r0 = h_base // sel_group
        n_r = max(1, h_chunk // sel_group)
        rep = h_chunk // n_r
        tv_c = jnp.broadcast_to(tvp[r0:r0 + n_r][:, None],
                                (n_r, rep, t_max)).reshape(h_chunk, t_max)
        tid_lane = jnp.broadcast_to(tv_c[:, :, None],
                                    (h_chunk, t_max, ps)).reshape(1, lt_c)
        scs, oks = [], []
        for u in range(tps):
            sc = jax.lax.dot_general(
                q_all, ks_all[0, 0, u].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            sc = sc * kss_line[pl.ds(u, 1)]
            if clamp > 0.0:
                sc = jnp.clip(sc, -clamp, clamp)
            gt = tid_lane + u
            nv = jnp.where(
                (tid_lane < 0) | (t_lane >= n_t), 0,
                jnp.where(gt == w_tile, w_col + 1,
                          jnp.where(gt < w_tile, ps, 0)))
            ok = own & (col_in_tile < nv)
            scs.append(jnp.where(ok, sc, NEG_INF))
            oks.append(ok)
        m = scs[0].max(axis=-1, keepdims=True)
        for u in range(1, tps):
            m = jnp.maximum(m, scs[u].max(axis=-1, keepdims=True))
        l = jnp.zeros_like(m)
        pv = jnp.zeros((h_chunk * g, d), jnp.float32)
        for u in range(tps):
            e = jnp.where(oks[u], jnp.exp(scs[u] - m), 0.0)
            l = l + jnp.sum(e, axis=-1, keepdims=True)
            ev = e * vss_line[pl.ds(u, 1)]
            pv = pv + jax.lax.dot_general(
                ev, vs_all[0, 0, u].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out = pv / jnp.maximum(l, 1e-30)
        if h_chunk == kv:
            o_ref[0] = out.reshape(kv, g, d).astype(o_ref.dtype)
        else:
            o_scr[pl.ds(h_base * g, h_chunk * g)] = out

        # ---- drain the chunk's per-head write-backs before its packed
        # buffers are reloaded by the next chunk
        if g_eff == 1:
            for hh in range(h_chunk):
                h = h_base + hh
                pltpu.make_async_copy(
                    ks_all.at[:, :, pl.ds(0, 1), :, pl.ds(0, ps)],
                    k_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wk.at[h]).wait()
                pltpu.make_async_copy(
                    vs_all.at[:, :, pl.ds(0, 1), :, pl.ds(0, ps)],
                    v_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                    sem_wv.at[h]).wait()

    if g_eff > 1:
        gwk = pltpu.make_async_copy(
            stg_wk, k_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_gw)
        gwv = pltpu.make_async_copy(
            stg_wv, v_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_gw)
        gwk.start()
        gwv.start()

    if h_chunk != kv:
        o_ref[0] = o_scr[...].reshape(kv, g, d).astype(o_ref.dtype)
    if g_eff > 1:
        pltpu.make_async_copy(
            stg_wk, k_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)],
            sem_gw).wait()
        pltpu.make_async_copy(
            stg_wv, v_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)],
            sem_gw).wait()

    if write_codes:
        pltpu.make_async_copy(
            c_scr, c_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)],
            sem_c).wait()
    pltpu.make_async_copy(
        kslab.at[:, pl.ds(0, 1)],
        ksc_out.at[pl.ds(b, 1), pl.ds(w_tile, 1)], sem_s).wait()
    pltpu.make_async_copy(
        vslab.at[:, pl.ds(0, 1)],
        vsc_out.at[pl.ds(b, 1), pl.ds(w_tile, 1)], sem_s).wait()


@functools.partial(
    jax.jit, static_argnames=('ps', 'tps', 'scale', 'clamp', 'nt_layer',
                              'interpret', 'max_vmem_mb'))
def decode_attention_rows_q(q, k_cache, v_cache, c_cache, k_scale, v_scale,
                            tables, n_tiles, pos, k_new, v_new, c_new,
                            kscale_new, vscale_new, tile_base=None, *,
                            ps: int = 128, tps: int = 1, scale: float = 1.0,
                            clamp: float = 0.0, nt_layer: int = 0,
                            interpret: Optional[bool] = None,
                            max_vmem_mb: float = 12.0):
    """int8 contiguous tile-major decode attention + in-place append.

    Same contract as decode_attention_rows — including grouped tables
    (N_TAB < KV => sel_group grouped DMAs) and automatic head chunking —
    plus: k_cache/v_cache are int8, k_scale/v_scale [B, NT, KV_pad, ps]
    f32 hold one dequant scale per cached token (tile-major-outer layout:
    a layer's slab [nt_layer, KV_pad, ps] is one contiguous HBM burst;
    KV_pad is the kv head count rounded up to 8 — Mosaic DMAs fault when
    the second-minor dim straddles a sublane tile), k_new/v_new [B, KV, D]
    are PRE-QUANTIZED int8 and kscale_new/vscale_new [B, KV] their scales
    (see inference/engine.py::_quantize_kv). `nt_layer` = tiles per layer
    block (every table id must fall in [tile_base, tile_base+nt_layer));
    defaults to the whole pool. Returns (o, k', v', c', k_scale',
    v_scale') — all caches updated in place."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, kv, g, d = q.shape
    n_sub = c_cache.shape[3]
    t_max = tables.shape[2]
    n_tab = tables.shape[1]
    assert kv % n_tab == 0, (kv, n_tab)
    sel_group = kv // n_tab
    write_codes = n_sub > 1
    if nt_layer == 0:
        nt_layer = k_cache.shape[2]
    kv_pad = k_scale.shape[2]
    assert kv_pad >= kv and kv_pad % 8 == 0 or kv_pad == kv, \
        (kv, kv_pad)
    if kv_pad > kv:
        pad = ((0, 0), (0, kv_pad - kv))
        kscale_new = jnp.pad(kscale_new, pad)
        vscale_new = jnp.pad(vscale_new, pad)
    slab_mb = 2 * nt_layer * kv_pad * ps * 4 / 2**20
    h_chunk = kv

    def _mb(hc):
        return (2 * hc * t_max * tps * ps * d * k_cache.dtype.itemsize
                + 2 * tps * hc * t_max * ps * 4) / 2**20 + slab_mb

    def _ok(hc):
        if _mb(hc) >= max_vmem_mb:
            return False
        return hc == kv or hc * t_max * tps * ps <= 2 ** 15
    while h_chunk > 1 and not _ok(h_chunk):
        h_chunk = next(c for c in range(h_chunk - 1, 0, -1)
                       if kv % c == 0
                       and (c % sel_group == 0 or sel_group % c == 0))
    assert _ok(h_chunk), (
        f'packed int8 K/V + scale buffers need {_mb(h_chunk):.1f} MB VMEM '
        f'even at one head per chunk — reduce the table width (t_max) or '
        f'tps')
    g_eff = min(sel_group, h_chunk)
    if tile_base is None:
        tile_base = jnp.zeros((b,), jnp.int32)
    lt_c = h_chunk * t_max * ps
    scratch = [
        pltpu.VMEM((1, 1, tps, d, lt_c), k_cache.dtype),
        pltpu.VMEM((1, 1, tps, d, lt_c), v_cache.dtype),
        pltpu.VMEM((1, nt_layer, kv_pad, ps), jnp.float32),
        pltpu.VMEM((1, nt_layer, kv_pad, ps), jnp.float32),
        pltpu.VMEM((tps, lt_c), jnp.float32),
        pltpu.VMEM((tps, lt_c), jnp.float32),
        pltpu.VMEM((1, kv, 1, n_sub, ps), c_cache.dtype),
        pltpu.VMEM((kv * g, d), jnp.float32),   # chunked-output staging
    ]
    if g_eff > 1:
        scratch += [
            pltpu.VMEM((NBUF, g_eff, tps, d, ps), k_cache.dtype),
            pltpu.VMEM((NBUF, g_eff, tps, d, ps), v_cache.dtype),
            pltpu.VMEM((1, kv, 1, d, ps), k_cache.dtype),
            pltpu.VMEM((1, kv, 1, d, ps), v_cache.dtype),
        ]
    scratch += [
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA((kv,)),
        pltpu.SemaphoreType.DMA((kv,)),
        pltpu.SemaphoreType.DMA(()),
        pltpu.SemaphoreType.DMA(()),
    ]
    if g_eff > 1:
        scratch += [
            pltpu.SemaphoreType.DMA((NBUF,)),
            pltpu.SemaphoreType.DMA(()),
        ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kv, g, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, kv, d, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, kv, d, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, kv, n_sub, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, kv_pad, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, 1, kv_pad, 1), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, n_tab, t_max), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, kv, g, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_rows_kernel_q, ps=ps, tps=tps, t_max=t_max,
                               nt_layer=nt_layer, scale=scale, clamp=clamp,
                               write_codes=write_codes, kv=kv,
                               sel_group=sel_group, h_chunk=h_chunk)
    o, k2, v2, c2, ks2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kv, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(c_cache.shape, c_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        # flattened inputs: 4 scalars, q=4, k_cache=5, v_cache=6,
        # c_cache=7, k_scale=8, v_scale=9, k_new=10, v_new=11, c_new=12,
        # kscale_new=13, vscale_new=14, tables(vmem)=15
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4, 9: 5},
        compiler_params=pltpu.CompilerParams(
            # each program reads/writes only its own slot's tiles =>
            # megacore may split the batch grid across TensorCores
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(tables, n_tiles, pos, tile_base, q, k_cache, v_cache, c_cache,
      k_scale, v_scale, k_new[..., None], v_new[..., None],
      c_new[..., None], kscale_new[:, None, :, None],
      vscale_new[:, None, :, None], tables)
    return o, k2, v2, c2, ks2, vs2


def _rows_kernel_q_ms(tables, n_tiles, pos, tile_base,               # SMEM
                      q_ref, k_ref, v_ref, c_ref, ksc_ref, vsc_ref,
                      kn_ref, vn_ref, cn_ref, kscn_ref, vscn_ref,
                      tabv_ref,
                      o_ref, k_out, v_out, c_out, ksc_out, vsc_out,
                      ks_all, vs_all, kslab, vslab, kss_line, vss_line,
                      c_scr,
                      sem_l, sem_wk, sem_wv, sem_c, sem_s,
                      *, ps: int, tps: int, t_max: int, nt_layer: int,
                      scale: float, clamp: float, write_codes: bool,
                      kv: int, b_tot: int):
    """Multi-slot twin of _rows_kernel_q: int8 tiles + per-token scale
    slabs, one grid program looping slots with double-buffered tile AND
    slab staging (line buffers are packed/consumed sequentially per slot,
    so they stay single-buffered)."""
    g = q_ref.shape[2]
    d = q_ref.shape[3]
    hspan = t_max * ps
    ltot = kv * hspan
    kv_pad = kslab.shape[2]

    def issue_reads(b, buf):
        base = tile_base[b]
        rks = pltpu.make_async_copy(
            ksc_ref.at[pl.ds(b, 1), pl.ds(base, nt_layer)],
            kslab.at[pl.ds(buf, 1)], sem_s.at[buf])
        rvs = pltpu.make_async_copy(
            vsc_ref.at[pl.ds(b, 1), pl.ds(base, nt_layer)],
            vslab.at[pl.ds(buf, 1)], sem_s.at[buf])
        rks.start()
        rvs.start()
        cs = []
        for h in range(kv):
            for t in range(t_max):
                tid = jnp.maximum(tables[b, h, t], 0)
                lane0 = (h * t_max + t) * ps
                ck = pltpu.make_async_copy(
                    k_ref.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, tps)],
                    ks_all.at[pl.ds(buf, 1), :, :, :, pl.ds(lane0, ps)],
                    sem_l.at[buf])
                cv = pltpu.make_async_copy(
                    v_ref.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, tps)],
                    vs_all.at[pl.ds(buf, 1), :, :, :, pl.ds(lane0, ps)],
                    sem_l.at[buf])
                ck.start()
                cv.start()
                cs.append((ck, cv))
        return (rks, rvs), cs

    live = {0: issue_reads(0, 0)}
    for b in range(b_tot):
        buf = b % 2
        n_t = n_tiles[b]
        p_b = pos[b]
        base = tile_base[b]
        w_tile = base + p_b // ps
        w_col = jax.lax.rem(p_b, ps)

        wc = None
        if write_codes:
            rc = pltpu.make_async_copy(
                c_ref.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], c_scr, sem_c)
            rc.start()

        (rks, rvs), copies = live.pop(b)
        rks.wait()
        rvs.wait()
        # merge the new token's scales into this slot's slab, write the
        # write-tile scale rows back (one strided copy per operand)
        rel_w = w_tile - base
        slab_t = jax.lax.broadcasted_iota(jnp.int32,
                                          (1, nt_layer, kv_pad, ps), 1)
        slab_l = jax.lax.broadcasted_iota(jnp.int32,
                                          (1, nt_layer, kv_pad, ps), 3)
        sel_s = (slab_t == rel_w) & (slab_l == w_col)
        kscn = kscn_ref[pl.ds(b, 1)]                     # [1, 1, kv_pad, 1]
        vscn = vscn_ref[pl.ds(b, 1)]
        kslab[pl.ds(buf, 1)] = jnp.where(sel_s, kscn, kslab[pl.ds(buf, 1)])
        vslab[pl.ds(buf, 1)] = jnp.where(sel_s, vscn, vslab[pl.ds(buf, 1)])
        wks = pltpu.make_async_copy(
            kslab.at[pl.ds(buf, 1), pl.ds(rel_w, 1)],
            ksc_out.at[pl.ds(b, 1), pl.ds(w_tile, 1)], sem_s.at[buf])
        wvs = pltpu.make_async_copy(
            vslab.at[pl.ds(buf, 1), pl.ds(rel_w, 1)],
            vsc_out.at[pl.ds(b, 1), pl.ds(w_tile, 1)], sem_s.at[buf])
        wks.start()
        wvs.start()

        # pack this slot's scale lanes (merged) into the line buffers —
        # VPU moves that overlap the in-flight tile DMAs
        for h in range(kv):
            for t in range(t_max):
                rel = jnp.clip(tables[b, h, t] - base, 0, nt_layer - tps)
                lane0 = (h * t_max + t) * ps
                for u in range(tps):
                    kss_line[pl.ds(u, 1), pl.ds(lane0, ps)] = \
                        kslab[buf, pl.ds(rel + u, 1), h]
                    vss_line[pl.ds(u, 1), pl.ds(lane0, ps)] = \
                        vslab[buf, pl.ds(rel + u, 1), h]

        for ck, cv in copies:
            ck.wait()
            cv.wait()

        if write_codes:
            rc.wait()
            ccols = jax.lax.broadcasted_iota(jnp.int32, c_scr.shape, 4)
            cn = cn_ref[pl.ds(b, 1)][:, :, None]
            c_scr[...] = jnp.where(ccols == w_col, cn, c_scr[...])
            wc = pltpu.make_async_copy(
                c_scr, c_out.at[pl.ds(b, 1), :, pl.ds(w_tile, 1)], sem_c)
            wc.start()

        # merge the new token's int8 K/V columns, start tile write-backs
        u_w = jax.lax.rem(w_tile, tps)
        sub_i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 2)
        lane_i5 = jax.lax.broadcasted_iota(jnp.int32, (1, 1, tps, d, ps), 4)
        wbs = []
        for h in range(kv):
            off = (h * t_max + n_t - 1) * ps
            kn = kn_ref[pl.ds(b, 1), pl.ds(h, 1)][0]
            vn = vn_ref[pl.ds(b, 1), pl.ds(h, 1)][0]
            sel = (sub_i == u_w) & (lane_i5 == w_col)
            ks_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, kn, ks_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)])
            vs_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)] = jnp.where(
                sel, vn, vs_all[pl.ds(buf, 1), :, :, :, pl.ds(off, ps)])
            wk = pltpu.make_async_copy(
                ks_all.at[pl.ds(buf, 1), :, pl.ds(u_w, 1), :,
                          pl.ds(off, ps)],
                k_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                sem_wk.at[buf, h])
            wv = pltpu.make_async_copy(
                vs_all.at[pl.ds(buf, 1), :, pl.ds(u_w, 1), :,
                          pl.ds(off, ps)],
                v_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(w_tile, 1)],
                sem_wv.at[buf, h])
            wk.start()
            wv.start()
            wbs.append((wk, wv))

        if b + 1 < b_tot and (b + 1) not in live:
            live[b + 1] = issue_reads(b + 1, (b + 1) % 2)

        # ---- attention math (dequant folded; overlaps b+1's reads)
        q_all = q_ref[pl.ds(b, 1)][0].reshape(kv * g, d).astype(jnp.float32)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (kv * g, ltot), 1)
        row_i = jax.lax.broadcasted_iota(jnp.int32, (kv * g, ltot), 0)
        own = (lane_i // hspan) == (row_i // g)
        col_in_tile = jax.lax.rem(lane_i, ps)
        tv = tabv_ref[b]
        tid_lane = jnp.broadcast_to(tv[:, :, None],
                                    (kv, t_max, ps)).reshape(1, ltot)
        e_lane = lane_i[:1] // ps
        t_lane = jax.lax.rem(e_lane, t_max)
        scs, oks = [], []
        for u in range(tps):
            sc = jax.lax.dot_general(
                q_all, ks_all[buf, 0, u].astype(jnp.float32),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32) * scale
            sc = sc * kss_line[pl.ds(u, 1)]
            if clamp > 0.0:
                sc = jnp.clip(sc, -clamp, clamp)
            gt = tid_lane + u
            nv = jnp.where(
                (tid_lane < 0) | (t_lane >= n_t), 0,
                jnp.where(gt == w_tile, w_col + 1,
                          jnp.where(gt < w_tile, ps, 0)))
            ok = own & (col_in_tile < nv)
            scs.append(jnp.where(ok, sc, NEG_INF))
            oks.append(ok)
        m = scs[0].max(axis=-1, keepdims=True)
        for u in range(1, tps):
            m = jnp.maximum(m, scs[u].max(axis=-1, keepdims=True))
        lsum = jnp.zeros_like(m)
        pv = jnp.zeros((kv * g, d), jnp.float32)
        for u in range(tps):
            e = jnp.where(oks[u], jnp.exp(scs[u] - m), 0.0)
            lsum = lsum + jnp.sum(e, axis=-1, keepdims=True)
            ev = e * vss_line[pl.ds(u, 1)]
            pv = pv + jax.lax.dot_general(
                ev, vs_all[buf, 0, u].astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        out = pv / jnp.maximum(lsum, 1e-30)
        o_ref[pl.ds(b, 1)] = out.reshape(1, kv, g, d).astype(o_ref.dtype)

        # drain this slot's write-backs, then issue b+2's reads into buf
        if wc is not None:
            wc.wait()
        wks.wait()
        wvs.wait()
        for wk, wv in wbs:
            wk.wait()
            wv.wait()
        if b + 2 < b_tot:
            live[b + 2] = issue_reads(b + 2, buf)


@functools.partial(
    jax.jit, static_argnames=('ps', 'tps', 'scale', 'clamp', 'nt_layer',
                              'interpret'))
def decode_attention_rows_q_ms(q, k_cache, v_cache, c_cache, k_scale,
                               v_scale, tables, n_tiles, pos, k_new, v_new,
                               c_new, kscale_new, vscale_new,
                               tile_base=None, *,
                               ps: int = 128, tps: int = 1,
                               scale: float = 1.0, clamp: float = 0.0,
                               nt_layer: int = 0,
                               interpret: Optional[bool] = None):
    """Multi-slot twin of decode_attention_rows_q (same contract). One
    grid program loops all slots with double-buffered tile + scale-slab
    staging; use when the doubled staging fits VMEM."""
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, kv, g, d = q.shape
    n_sub = c_cache.shape[3]
    t_max = tables.shape[2]
    if tables.shape[1] != kv:
        tables = jnp.repeat(tables, kv // tables.shape[1], axis=1)
    write_codes = n_sub > 1
    if nt_layer == 0:
        nt_layer = k_cache.shape[2]
    kv_pad = k_scale.shape[2]
    assert kv_pad >= kv and kv_pad % 8 == 0 or kv_pad == kv, \
        (kv, kv_pad)
    if kv_pad > kv:
        pad = ((0, 0), (0, kv_pad - kv))
        kscale_new = jnp.pad(kscale_new, pad)
        vscale_new = jnp.pad(vscale_new, pad)
    vmem_mb = 2 * (kv * t_max * tps * ps * 2 * d * k_cache.dtype.itemsize
                   + kv_pad * nt_layer * ps * 2 * 4) / 2**20
    assert vmem_mb < 11, (
        f'double-buffered packed K/V + scale slabs need {vmem_mb:.1f} MB '
        f'VMEM — use decode_attention_rows_q (grid kernel) instead')
    if tile_base is None:
        tile_base = jnp.zeros((b,), jnp.int32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, kv, g, d), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((b, kv, d, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, kv, d, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, kv, n_sub, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, 1, kv_pad, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, 1, kv_pad, 1), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec((b, kv, t_max), lambda i, *_: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, kv, g, d), lambda i, *_: (0, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, 1, tps, d, kv * t_max * ps), k_cache.dtype),
            pltpu.VMEM((2, 1, tps, d, kv * t_max * ps), v_cache.dtype),
            pltpu.VMEM((2, nt_layer, kv_pad, ps), jnp.float32),
            pltpu.VMEM((2, nt_layer, kv_pad, ps), jnp.float32),
            pltpu.VMEM((tps, kv * t_max * ps), jnp.float32),
            pltpu.VMEM((tps, kv * t_max * ps), jnp.float32),
            pltpu.VMEM((1, kv, 1, n_sub, ps), c_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2, kv)),
            pltpu.SemaphoreType.DMA((2, kv)),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_rows_kernel_q_ms, ps=ps, tps=tps,
                               t_max=t_max, nt_layer=nt_layer, scale=scale,
                               clamp=clamp, write_codes=write_codes, kv=kv,
                               b_tot=b)
    o, k2, v2, c2, ks2, vs2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kv, g, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(c_cache.shape, c_cache.dtype),
            jax.ShapeDtypeStruct(k_scale.shape, k_scale.dtype),
            jax.ShapeDtypeStruct(v_scale.shape, v_scale.dtype),
        ],
        # flattened inputs: 4 scalars, q=4, k_cache=5, v_cache=6,
        # c_cache=7, k_scale=8, v_scale=9, k_new=10, v_new=11, c_new=12,
        # kscale_new=13, vscale_new=14, tables(vmem)=15
        input_output_aliases={5: 1, 6: 2, 7: 3, 8: 4, 9: 5},
        interpret=interpret,
    )(tables, n_tiles, pos, tile_base, q, k_cache, v_cache, c_cache,
      k_scale, v_scale, k_new[..., None], v_new[..., None],
      c_new[..., None], kscale_new[:, None, :, None],
      vscale_new[:, None, :, None], tables)
    return o, k2, v2, c2, ks2, vs2


def decode_attention_rows_q_ref(q, k_cache, v_cache, c_cache, k_scale,
                                v_scale, tables, n_tiles, pos, k_new,
                                v_new, c_new, kscale_new, vscale_new,
                                tile_base=None, *, ps: int = 128,
                                tps: int = 1, scale: float = 1.0,
                                clamp: float = 0.0):
    """jnp oracle for decode_attention_rows_q: dequantize the whole cache
    and defer to decode_attention_rows_ref semantics."""
    b, kv, g, d = q.shape
    if tile_base is None:
        tile_base = jnp.zeros((b,), jnp.int32)
    bi = jnp.arange(b)[:, None]
    hi = jnp.arange(kv)[None, :]
    wt = (tile_base + pos // ps)[:, None]
    wc = jax.lax.rem(pos, ps)[:, None]
    upd = lambda cache, new: cache.at[bi, hi, wt, :, wc].set(
        new.astype(cache.dtype))
    k_cache = upd(k_cache, k_new)
    v_cache = upd(v_cache, v_new)
    c_cache = upd(c_cache, c_new)
    # scales are [B, NT, KV_pad, ps]: index (b, tile, head, lane)
    k_scale = k_scale.at[bi, wt, hi, wc].set(kscale_new)
    v_scale = v_scale.at[bi, wt, hi, wc].set(vscale_new)
    sc_t = lambda s_: s_.transpose(0, 2, 1, 3)[:, :kv, :, None, :]
    kf = k_cache.astype(jnp.float32) * sc_t(k_scale)
    vf = v_cache.astype(jnp.float32) * sc_t(v_scale)
    o, _, _, _ = decode_attention_rows_ref(
        q, kf, vf, c_cache, tables, n_tiles, pos,
        (k_new.astype(jnp.float32) * kscale_new[..., None]),
        (v_new.astype(jnp.float32) * vscale_new[..., None]),
        c_new, tile_base, ps=ps, tps=tps, scale=scale, clamp=clamp)
    return o.astype(q.dtype), k_cache, v_cache, c_cache, k_scale, v_scale


def decode_attention_rows_ref(q, k_cache, v_cache, c_cache, tables,
                              n_tiles, pos, k_new, v_new, c_new,
                              tile_base=None, *,
                              ps: int = 128, tps: int = 1,
                              scale: float = 1.0, clamp: float = 0.0):
    """jnp oracle for decode_attention_rows (same argument contract).
    Caches tile-major [B, KV, NT, D, ps]. Grouped tables ([B, N_TAB < KV,
    T]) are expanded to per-head."""
    b, kv, g, d = q.shape
    if tables.shape[1] != kv:
        tables = jnp.repeat(tables, kv // tables.shape[1], axis=1)
    nt_all = k_cache.shape[2]
    if tile_base is None:
        tile_base = jnp.zeros((b,), jnp.int32)
    bi = jnp.arange(b)[:, None]
    hi = jnp.arange(kv)[None, :]
    wt = (tile_base + pos // ps)[:, None]
    wc = jax.lax.rem(pos, ps)[:, None]
    upd = lambda cache, new: cache.at[bi, hi, wt, :, wc].set(
        new.astype(cache.dtype))
    k_cache = upd(k_cache, k_new)
    v_cache = upd(v_cache, v_new)
    c_cache = upd(c_cache, c_new)
    t_max = tables.shape[2]
    # expand table entries to their tps-wide tile ranges
    gt = (jnp.maximum(tables, 0)[..., None]
          + jnp.arange(tps)[None, None, None, :]).reshape(b, kv, -1)
    pad = jnp.repeat(tables < 0, tps, axis=-1)
    kg = jnp.take_along_axis(k_cache, gt[..., None, None], axis=2)
    vg = jnp.take_along_axis(v_cache, gt[..., None, None], axis=2)
    s = jnp.einsum('bkgd,bktdp->bkgtp', q.astype(jnp.float32),
                   kg.astype(jnp.float32)) * scale
    if clamp > 0.0:
        s = jnp.clip(s, -clamp, clamp)
    t_idx = jnp.arange(t_max * tps)[None, None, :, None] // tps
    p_idx = jnp.arange(ps)[None, None, None, :]
    w_tile = (tile_base + pos // ps)[:, None, None, None]
    w_col = jax.lax.rem(pos, ps)[:, None, None, None]
    gt4 = gt[..., None]
    n_valid = jnp.where(pad[..., None], 0,
                        jnp.where(gt4 == w_tile, w_col + 1,
                                  jnp.where(gt4 < w_tile, ps, 0)))
    ok = (t_idx < n_tiles[:, None, None, None]) & (p_idx < n_valid)
    s = jnp.where(ok[:, :, None], s, NEG_INF)
    flat = s.reshape(b, kv, g, -1)
    p = jax.nn.softmax(flat, axis=-1).reshape(s.shape)
    p = jnp.where(ok[:, :, None], p, 0.0)
    o = jnp.einsum('bkgtp,bktdp->bkgd', p.astype(vg.dtype), vg)
    return o.astype(q.dtype), k_cache, v_cache, c_cache


# ---------------------------------------------------------------------------
# v4: block-verify kernel (speculative decoding)
# ---------------------------------------------------------------------------
#
# verify_attention_rows scores K=draft_depth+1 query columns per slot
# against a per-head table of tiles (the UNION of every query's decode
# selection), appends the block's K new K/V (+code) columns in place, and
# masks per (query, lane) so each query sees EXACTLY what a sequential
# decode_step at its position would (engine.verify_step builds the table
# + a per-entry K-bit visibility mask encoding that contract). One kernel
# call per layer replaces K sequential decode kernel calls — speculative
# decoding's win is the per-step fixed cost (docs/PERF.md "decode
# floor"), and the MXU does K query rows for the price of one.
#
# Structure: grid (B,); per program a Python-unrolled loop over kv heads
# with NBUF-deep double-buffered tile staging (head h+1's DMAs are issued
# before head h's math runs). The K new columns can span at most TWO
# cache tiles (kk <= ps); the table's LAST TWO entries must be those
# write tiles (duplicated when equal — the wrapper zeroes the duplicate's
# visibility bits so no lane is counted twice).

def _verify_kernel(tables, selm, pos, tile_base,                     # SMEM
                   q_ref, k_ref, v_ref, c_ref, kn_ref, vn_ref, cn_ref,
                   tabv_ref, selv_ref,
                   o_ref, k_out, v_out, c_out,
                   kbuf, vbuf, c_scr,
                   sem_l, sem_w, sem_c,
                   *, ps: int, t_max: int, kk: int, scale: float,
                   clamp: float, write_codes: bool, kv: int):
    b = pl.program_id(0)
    gk = q_ref.shape[2]                 # G * K rows per head
    d = q_ref.shape[3]
    p_b = pos[b]
    base = tile_base[b]
    lh = t_max * ps

    # ---- codes: read both write-tile slabs (all heads in one DMA each),
    # merge the K new code columns, write back. If the two write tiles
    # coincide the slabs merge identically and the duplicate write is a
    # same-bytes no-op.
    if write_codes:
        for t in range(2):
            e = t_max - 2 + t
            tid = jnp.maximum(tables[b, 0, e], 0)
            pltpu.make_async_copy(
                c_ref.at[pl.ds(b, 1), :, pl.ds(tid, 1)],
                c_scr.at[pl.ds(t, 1), 0], sem_c.at[t]).start()
        ccols = jax.lax.broadcasted_iota(jnp.int32, c_scr.shape, 5)
        for t in range(2):
            e = t_max - 2 + t
            tid = jnp.maximum(tables[b, 0, e], 0)
            pltpu.make_async_copy(
                c_ref.at[pl.ds(b, 1), :, pl.ds(tid, 1)],
                c_scr.at[pl.ds(t, 1), 0], sem_c.at[t]).wait()
            merged = c_scr[pl.ds(t, 1)]
            for i in range(kk):
                t_i = base + (p_b + i) // ps
                c_i = jax.lax.rem(p_b + i, ps)
                cn = cn_ref[0, :, :, pl.ds(i, 1)]       # [kv, n_sub, 1]
                hit = (tid == t_i) & (ccols[t:t + 1] == c_i)
                merged = jnp.where(hit, cn[None, None, :, None], merged)
            c_scr[pl.ds(t, 1)] = merged
            pltpu.make_async_copy(
                c_scr.at[pl.ds(t, 1), 0],
                c_out.at[pl.ds(b, 1), :, pl.ds(tid, 1)],
                sem_c.at[t]).start()

    # ---- per-head tile staging with NBUF-deep lookahead
    def issue(h):
        slot = h % NBUF
        cs = []
        for e in range(t_max):
            tid = jnp.maximum(tables[b, h, e], 0)
            ck = pltpu.make_async_copy(
                k_ref.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, 1)],
                kbuf.at[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)],
                sem_l.at[slot])
            cv = pltpu.make_async_copy(
                v_ref.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, 1)],
                vbuf.at[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)],
                sem_l.at[slot])
            ck.start()
            cv.start()
            cs.append((ck, cv))
        return cs

    live = {}
    for h in range(min(NBUF, kv)):
        live[h] = issue(h)

    lane5 = jax.lax.broadcasted_iota(
        jnp.int32, (1, 1, 1, d, ps), 4)
    lane_i = jax.lax.broadcasted_iota(jnp.int32, (1, lh), 1)
    col_lane = jax.lax.rem(lane_i, ps)
    row_i = jax.lax.broadcasted_iota(jnp.int32, (gk, 1), 0)
    k_r = jax.lax.rem(row_i, kk)                         # [gk, 1]
    bitmask = jnp.left_shift(jnp.int32(1), k_r)          # [gk, 1]
    writes = {}
    for h in range(kv):
        slot = h % NBUF
        for ck, cv in live.pop(h):
            ck.wait()
            cv.wait()
        # ---- merge the K new columns into the two write-tile entries
        for t in range(2):
            e = t_max - 2 + t
            tid_e = tables[b, h, e]
            kseg = kbuf[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)]
            vseg = vbuf[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)]
            for i in range(kk):
                t_i = base + (p_b + i) // ps
                c_i = jax.lax.rem(p_b + i, ps)
                hit = (tid_e == t_i) & (lane5 == c_i)
                kn = kn_ref[0, pl.ds(h, 1), :, pl.ds(i, 1)]  # [1, d, 1]
                vn = vn_ref[0, pl.ds(h, 1), :, pl.ds(i, 1)]
                kseg = jnp.where(hit, kn[None, None], kseg)
                vseg = jnp.where(hit, vn[None, None], vseg)
            kbuf[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)] = kseg
            vbuf[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)] = vseg
        # ---- write the two (merged) write tiles back
        wl = []
        for t in range(2):
            e = t_max - 2 + t
            tid = jnp.maximum(tables[b, h, e], 0)
            wk = pltpu.make_async_copy(
                kbuf.at[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)],
                k_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, 1)],
                sem_w.at[slot, t, 0])
            wv = pltpu.make_async_copy(
                vbuf.at[pl.ds(slot, 1), :, :, :, pl.ds(e * ps, ps)],
                v_out.at[pl.ds(b, 1), pl.ds(h, 1), pl.ds(tid, 1)],
                sem_w.at[slot, t, 1])
            wk.start()
            wv.start()
            wl.append((wk, wv))
        writes[h] = wl
        # ---- attention for this head: [GK, D] x [D, t_max*ps]
        q_h = q_ref[0, pl.ds(h, 1)][0].astype(jnp.float32)   # [gk, d]
        kmat = kbuf[pl.ds(slot, 1)][0, 0, 0]                 # [d, lh]
        sc = jax.lax.dot_general(
            q_h, kmat.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        if clamp > 0.0:
            sc = jnp.clip(sc, -clamp, clamp)
        tv = tabv_ref[0, h]                                  # [t_max]
        sv = selv_ref[0, h]
        tid_lane = jnp.broadcast_to(tv[:, None], (t_max, ps)
                                    ).reshape(1, lh)
        sel_lane = jnp.broadcast_to(sv[:, None], (t_max, ps)
                                    ).reshape(1, lh)
        g_pos = (tid_lane - base) * ps + col_lane
        ok = ((tid_lane >= 0)
              & ((sel_lane & bitmask) != 0)
              & (g_pos <= p_b + k_r))
        sc = jnp.where(ok, sc, NEG_INF)
        m = sc.max(axis=-1, keepdims=True)
        e_x = jnp.where(ok, jnp.exp(sc - m), 0.0)
        l = jnp.sum(e_x, axis=-1, keepdims=True)
        vmat = vbuf[pl.ds(slot, 1)][0, 0, 0]                 # [d, lh]
        pv = jax.lax.dot_general(
            e_x.astype(vmat.dtype), vmat, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        out = pv / jnp.maximum(l, 1e-30)
        if h + NBUF < kv:
            # this slot's write-back DMAs read kbuf/vbuf[slot]; they must
            # land before head h+NBUF's tile reads overwrite the slot
            for wk, wv in writes.pop(h):
                wk.wait()
                wv.wait()
            live[h + NBUF] = issue(h + NBUF)
        o_ref[0, pl.ds(h, 1)] = out[None].astype(o_ref.dtype)

    for wl in writes.values():
        for wk, wv in wl:
            wk.wait()
            wv.wait()
    if write_codes:
        for t in range(2):
            e = t_max - 2 + t
            tid = jnp.maximum(tables[b, 0, e], 0)
            pltpu.make_async_copy(
                c_scr.at[pl.ds(t, 1), 0],
                c_out.at[pl.ds(b, 1), :, pl.ds(tid, 1)],
                sem_c.at[t]).wait()


@functools.partial(
    jax.jit, static_argnames=('ps', 'scale', 'clamp', 'interpret'))
def verify_attention_rows(q, k_cache, v_cache, c_cache, tables, sel_mask,
                          pos, k_new, v_new, c_new, tile_base=None, *,
                          ps: int = 128, scale: float = 1.0,
                          clamp: float = 0.0,
                          interpret: Optional[bool] = None):
    """Block-verify attention + in-place K-column append (speculative
    decoding; see engine.verify_step for the semantics contract).

    q [B, KV, G*K, D] (row r of a head = query group r // K, block
    position r % K); caches tile-major as decode_attention_rows;
    tables [B, KV, T] PHYSICAL tile ids, -1 padding, LAST TWO entries =
    the block's write tiles (first may duplicate the second when the
    block stays within one tile — its sel_mask must then be 0);
    sel_mask [B, KV, T] int32, bit j = block position j may attend this
    entry's tile (tile-level visibility; within-tile causality is the
    kernel's g_pos <= pos + j rule). pos [B] = pre-block lengths;
    k_new/v_new [B, KV, D, K]; c_new [B, KV, n_sub, K].
    Returns (o [B, KV, G*K, D], k', v', c') with caches updated in place.
    """
    if interpret is None:
        interpret = jax.default_backend() != 'tpu'
    b, kv, gk, d = q.shape
    kk = k_new.shape[3]
    assert kk <= ps, (kk, ps)
    assert kk <= 30, 'sel_mask is an int32 bitfield'
    assert gk % kk == 0, (gk, kk)
    n_sub = c_cache.shape[3]
    t_max = tables.shape[2]
    assert t_max >= 2, t_max
    assert tables.shape[1] == kv, 'verify tables are per-head'
    write_codes = n_sub > 1
    vmem_mb = NBUF * 2 * t_max * ps * d * k_cache.dtype.itemsize / 2**20
    assert vmem_mb < 12, (
        f'staged K/V buffers need {vmem_mb:.1f} MB VMEM — reduce the '
        f'table width (t_max)')
    if tile_base is None:
        tile_base = jnp.zeros((b,), jnp.int32)
    scratch = [
        pltpu.VMEM((NBUF, 1, 1, d, t_max * ps), k_cache.dtype),
        pltpu.VMEM((NBUF, 1, 1, d, t_max * ps), v_cache.dtype),
        pltpu.VMEM((2, 1, kv, 1, n_sub, ps), c_cache.dtype),
        pltpu.SemaphoreType.DMA((NBUF,)),
        pltpu.SemaphoreType.DMA((NBUF, 2, 2)),
        pltpu.SemaphoreType.DMA((2,)),
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, kv, gk, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec((1, kv, d, kk), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, kv, d, kk), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, kv, n_sub, kk), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec((1, kv, t_max), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec((1, kv, t_max), lambda i, *_: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, kv, gk, d), lambda i, *_: (i, 0, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.HBM),
        ],
        scratch_shapes=scratch,
    )
    kernel = functools.partial(_verify_kernel, ps=ps, t_max=t_max, kk=kk,
                               scale=scale, clamp=clamp,
                               write_codes=write_codes, kv=kv)
    o, k2, v2, c2 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b, kv, gk, d), q.dtype),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
            jax.ShapeDtypeStruct(c_cache.shape, c_cache.dtype),
        ],
        # flattened inputs: 4 scalars, q=4, k_cache=5, v_cache=6,
        # c_cache=7, k_new=8, v_new=9, c_new=10, tables(vmem)=11,
        # sel_mask(vmem)=12
        input_output_aliases={5: 1, 6: 2, 7: 3},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel',)),
        interpret=interpret,
    )(tables, sel_mask, pos, tile_base, q, k_cache, v_cache, c_cache,
      k_new, v_new, c_new, tables, sel_mask)
    return o, k2, v2, c2
