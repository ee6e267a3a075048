"""Pallas TPU kernels for the general (non-QC) flood decoder.

The reference decodes *any* alist at full speed with per-thread CSR walks
(flood.cu:117-158). This module is the TPU answer for codes with no QC
structure to exploit: the round-4 breakdown (scripts/micro_general.py,
scripts/micro_gather.py) measured the XLA path's one-iteration cost at
B=128/bf16 as

- 41 ms per ``jnp.take`` row gather — **row-bound** at ~12-16 ns/row
  (sorted indices time the same as a random permutation; width 512B->1KB
  costs only +34%), so the two per-iteration edge-permutation gathers are
  an irreducible ~80 ms floor *per iteration*, independent of the lane
  count B;
- 57 ms for the XLA check-node update — a contiguous stream that should
  cost ~4 ms at the chip's measured ~500 GB/s (the degree-bucket
  reshape/reduce/φ chain materializes f32 intermediates).

Consequently this path keeps the two gathers in XLA (nothing beats the
hardware gather at its descriptor rate; a manual Pallas gather crashes
the remote Mosaic compiler and cannot beat row-bound DMA anyway) and
replaces every contiguous stage with fused Pallas stream kernels, then
recovers throughput by *widening B*: row-bound gathers cost the same at
B=256 as at B=128, so lanes are nearly free until HBM runs out.
Measured ships: 133.3 Mb/s at B=256, **168.5 Mb/s at B=384**
(StaticParams.parallel_factor_user=384, the widest that fits 16 GB —
scripts/out/bench_general_r4b.log); B=512 OOMs even with the in-place
kernel aliasing below + a bf16 pool (scripts/out/try_gp_b512*.log).

Layout: **plane-major padded buckets**. For a degree-d bucket of n nodes
(padded to ``count_pad`` rows, a multiple of the kernel tile), edge slot
k of node i lives at row ``edge_start + k*count_pad + i``. A Pallas block
of shape ``(d, T, lanes)`` over the ``[d, count_pad, B]`` view gives one
kernel step all d slots of T nodes with plain contiguous DMA — no
reshape tricks, no gather, no seam logic. For single-bucket (regular)
codes every reshape is a free metadata view; multi-bucket codes pay one
concatenate per pass to assemble the flat edge array (still ~10x cheaper
than the XLA bucket chain it replaces).

State is ``msgs_v [EV_pad, B]`` — φ-domain VN→CN messages in VN
plane-major order (like qc_pallas's variable-order store), so fresh-frame
init is a contiguous broadcast of φ(llr) with no gather at refill.

One iteration:

1. ``m_c  = take(msgs_v, perm_v2c)``       # row gather (XLA)
2. ``r_c  = CN kernel(m_c, syndrome)``      # Pallas stream, per bucket
3. ``r_v  = take(r_c, perm_c2v)``           # row gather (XLA)
4. ``msgs_v, bits = VN kernel(r_v, llr)``   # Pallas stream, per bucket

Numerics are kept bit-identical to the XLA oracle (ops/decode.py): φ via
qc_pallas._phi_abs_f32 (lockstep with ops/phi.py), the variable total is
downcast to the message dtype before the leave-one-out subtraction
exactly like bp_iteration's gathered ``t_edge``, and hard decisions honor
the sign of ±0 (flood.cu:180).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from ldpc_decoder_tpu.codes.compiled import CompiledCode
from ldpc_decoder_tpu.ops.phi import PRE_THRESHOLD, phi
from ldpc_decoder_tpu.ops.qc_decode import resolve_minsum_alpha
from ldpc_decoder_tpu.ops.qc_pallas import (
    _compiler_params,
    _copysign_bits,
    _interpret,
    _lane_block,
    _phi_abs_f32,
    _phi_high,
)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class PlaneBucket:
    """One degree bucket in the padded plane-major layout (static meta)."""

    degree: int
    node_start: int  # first padded node row of this bucket
    count: int  # real nodes
    count_pad: int  # padded node rows (multiple of tile)
    edge_start: int  # first edge row: slot k of node i at +k*count_pad+i
    tile: int  # kernel block rows for this bucket


# region starts stay aligned to the largest tile so every bucket's block
# index maps land on block boundaries of the shared flat arrays
_MAX_TILE = 1024


def _default_tile() -> int:
    return int(os.environ.get("LDPC_GP_TILE", "512"))


def _plan_buckets(buckets, tile: int):
    """Padded plane-major layout plan for one node side. Totals are
    rounded to the largest bucket tile so every kernel's block grid stays
    inside its (whole-array) operands without relying on Pallas edge
    masking."""
    plan, node_at, edge_at = [], 0, 0
    t_max = 8
    for b in buckets:
        t = min(tile, _round_up(b.count, 32))
        t_max = max(t_max, t)
        cp = _round_up(b.count, t)
        node_at = _round_up(node_at, t)
        edge_at = _round_up(edge_at, t)
        plan.append(
            PlaneBucket(degree=b.degree, node_start=node_at, count=b.count,
                        count_pad=cp, edge_start=edge_at, tile=t)
        )
        node_at += cp
        edge_at += b.degree * cp
    return tuple(plan), _round_up(node_at, t_max), _round_up(edge_at, t_max)


def _node_map(buckets, plan, n: int) -> np.ndarray:
    """sorted node row -> padded node row."""
    out = np.zeros(n, dtype=np.int64)
    for b, p in zip(buckets, plan):
        out[b.row_start : b.row_start + b.count] = p.node_start + np.arange(
            b.count, dtype=np.int64
        )
    return out


def _edge_map(buckets, plan, e: int) -> np.ndarray:
    """sorted edge row (node-major) -> padded plane-major edge row."""
    out = np.zeros(e, dtype=np.int64)
    for b, p in zip(buckets, plan):
        n = b.count * b.degree
        local = np.arange(n, dtype=np.int64)
        i, k = local // b.degree, local % b.degree
        out[b.edge_start : b.edge_start + n] = (
            p.edge_start + k * p.count_pad + i
        )
    return out


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "perm_v2c",
        "perm_c2v",
        "cn_edge_vnrow",
        "vn_pos",
        "vn_order",
        "cn_order",
        "erased_mask_sorted",
        "valid_c",
    ],
    meta_fields=[
        "n_vars", "n_checks", "n_edges",
        "nv_pad", "nc_pad", "ev_pad", "ec_pad",
        "vn_buckets", "cn_buckets",
    ],
)
@dataclasses.dataclass(frozen=True)
class GeneralPallasTables:
    """Padded plane-major index tables (pytree: arrays are jit args, so
    the multi-MB permutations never become HLO constants — embedding them
    stalls the remote TPU compiler, measured round 4)."""

    n_vars: int
    n_checks: int
    n_edges: int
    nv_pad: int
    nc_pad: int
    ev_pad: int
    ec_pad: int
    vn_buckets: tuple[PlaneBucket, ...]
    cn_buckets: tuple[PlaneBucket, ...]
    perm_v2c: jnp.ndarray  # [ec_pad] cn-layout row -> vn-layout row
    perm_c2v: jnp.ndarray  # [ev_pad] vn-layout row -> cn-layout row
    cn_edge_vnrow: jnp.ndarray  # [ec_pad] cn-layout row -> padded vn node row
    vn_pos: jnp.ndarray  # [n_vars] natural var id -> padded vn node row
    vn_order: jnp.ndarray  # [nv_pad] padded row -> natural var id (pad: 0)
    cn_order: jnp.ndarray  # [nc_pad] padded row -> natural check id (pad: 0)
    erased_mask_sorted: jnp.ndarray  # [nv_pad, 1] bool
    valid_c: jnp.ndarray  # [nc_pad, 1] bool: real (non-pad) check rows

    @staticmethod
    def from_compiled(cc: CompiledCode,
                      tile: int | None = None) -> "GeneralPallasTables":
        code = cc.code
        t = tile or _default_tile()
        if t > _MAX_TILE or t & (t - 1):
            raise ValueError(f"tile must be a power of two <= {_MAX_TILE}")
        vplan, nv_pad, ev_pad = _plan_buckets(cc.vn_buckets, t)
        cplan, nc_pad, ec_pad = _plan_buckets(cc.cn_buckets, t)

        vrow = _node_map(cc.vn_buckets, vplan, code.n_vars)
        vedge = _edge_map(cc.vn_buckets, vplan, code.n_edges)
        cedge = _edge_map(cc.cn_buckets, cplan, code.n_edges)

        perm_v2c = np.zeros(ec_pad, dtype=np.int32)
        perm_v2c[cedge] = vedge[np.asarray(cc.perm_v2c, dtype=np.int64)]
        perm_c2v = np.zeros(ev_pad, dtype=np.int32)
        perm_c2v[vedge] = cedge[np.asarray(cc.perm_c2v, dtype=np.int64)]
        cn_edge_vnrow = np.zeros(ec_pad, dtype=np.int32)
        cn_edge_vnrow[cedge] = vrow[
            np.asarray(cc.cn_edge_vnrow, dtype=np.int64)
        ]

        vn_pos = vrow[np.asarray(cc.vn_pos, dtype=np.int64)].astype(np.int32)
        vn_order = np.zeros(nv_pad, dtype=np.int32)
        vn_order[vrow] = np.asarray(cc.vn_order, dtype=np.int32)
        cn_order = np.zeros(nc_pad, dtype=np.int32)
        crow = _node_map(cc.cn_buckets, cplan, code.n_checks)
        cn_order[crow] = np.asarray(cc.cn_order, dtype=np.int32)

        erased = np.zeros(nv_pad, dtype=bool)
        if code.n_erased_vars:
            erased_nat = np.zeros(code.n_vars, dtype=bool)
            erased_nat[code.n_vars - code.n_erased_vars :] = True
            erased[vrow] = erased_nat[np.asarray(cc.vn_order)]
        valid_c = np.zeros(nc_pad, dtype=bool)
        valid_c[crow] = True

        return GeneralPallasTables(
            n_vars=code.n_vars,
            n_checks=code.n_checks,
            n_edges=code.n_edges,
            nv_pad=nv_pad, nc_pad=nc_pad, ev_pad=ev_pad, ec_pad=ec_pad,
            vn_buckets=vplan, cn_buckets=cplan,
            perm_v2c=jnp.asarray(perm_v2c),
            perm_c2v=jnp.asarray(perm_c2v),
            cn_edge_vnrow=jnp.asarray(cn_edge_vnrow),
            vn_pos=jnp.asarray(vn_pos),
            vn_order=jnp.asarray(vn_order),
            cn_order=jnp.asarray(cn_order),
            erased_mask_sorted=jnp.asarray(erased)[:, None],
            valid_c=jnp.asarray(valid_c)[:, None],
        )


# ---------------------------------------------------------------------------
# kernels


def _cn_kernel(phi_high: float, phi_pre: float, out_dtype):
    """Check-node pass over one [d, T, lb] node block (flood.cu:88-114):
    ext = Σ|m|, parity = syndrome ⊕ positive-vote count, out slot k =
    ±φ_abs(ext − |m_k|)."""

    def kernel(syn_ref, m_ref, o_ref):
        m = m_ref[...].astype(jnp.float32)  # [d, T, lb]
        a = jnp.abs(m)
        # sign-bit-domain parity algebra (identity + measurements:
        # qc_pallas_grouped._cn_kernel_g)
        u32 = jnp.uint32
        sbit = jnp.uint32(0x80000000)
        sb = jax.lax.bitcast_convert_type(m, u32) & sbit  # [d, T, lb]
        d = m.shape[0]
        X = syn_ref[...].astype(u32) << 31
        if d % 2:
            X = X ^ sbit
        for k in range(d):
            X = X ^ sb[k]
        ext = jnp.sum(a, axis=0)  # [T, lb]
        res = _phi_abs_f32(ext[None] - a, phi_high, phi_pre)
        r = jax.lax.bitcast_convert_type(res, u32) | (sb ^ X[None])
        o_ref[...] = jax.lax.bitcast_convert_type(
            r, jnp.float32).astype(out_dtype)

    return kernel


def _vn_kernel(phi_high: float, phi_pre: float, out_dtype):
    """Variable-node pass over one [d, T, lb] node block (flood.cu:132-180):
    total = llr + Σ incoming; out slot k = φ(total − r_k); hard bit =
    (total >= +0). The total is routed through the message dtype before
    the subtraction, matching the oracle's gathered ``t_edge``
    (ops/decode.bp_iteration)."""

    def kernel(llr_ref, r_ref, o_ref, bits_ref):
        r = r_ref[...].astype(jnp.float32)  # [d, T, lb]
        tot = llr_ref[...].astype(jnp.float32) + jnp.sum(r, axis=0)
        pre = tot.astype(out_dtype).astype(jnp.float32)[None] - r
        res = _phi_abs_f32(jnp.abs(pre), phi_high, phi_pre)
        o_ref[...] = _copysign_bits(res, pre).astype(out_dtype)
        bits_ref[...] = (~jnp.signbit(tot)).astype(jnp.int8)

    return kernel


def _store_block(o_ref, vals, qscale: float):
    """Quantize-on-write for int8 fixed-point messages (lockstep with
    qc_decode.quantize_msgs / qc_pallas_grouped._store_msg)."""
    if o_ref.dtype == jnp.int8:
        q = jnp.clip(jnp.round(vals * jnp.float32(qscale)), -127.0, 127.0)
        o_ref[...] = q.astype(jnp.int8)
    else:
        o_ref[...] = vals.astype(o_ref.dtype)


def _cn_kernel_minsum(beta: float, alpha: float, qscale: float, d: int):
    """Min-sum check-node pass over one [d, T, lb] node block:
    |out_k| = max(α · min_{j≠k} |m_j| − β, 0), sign via syndrome parity.
    Two-minimum running scan (first-minimum tie-break, lockstep with
    qc_pallas._cn_kernel's min-sum branch and the argmin-based oracle
    ops/decode.cn_update_minsum). ``qscale`` > 0: int8 fixed-point."""
    inv = 1.0 / qscale if qscale else 1.0

    def kernel(syn_ref, m_ref, o_ref):
        m = m_ref[...].astype(jnp.float32) * jnp.float32(inv)  # [d, T, lb]
        a = jnp.abs(m)
        # sign-bit-domain parity algebra (see _cn_kernel above)
        u32 = jnp.uint32
        sbit = jnp.uint32(0x80000000)
        sb = jax.lax.bitcast_convert_type(m, u32) & sbit
        X = syn_ref[...].astype(u32) << 31
        if d % 2:
            X = X ^ sbit
        for k in range(d):
            X = X ^ sb[k]
        m1 = a[0]
        m2 = jnp.full_like(m1, jnp.inf)
        pos = jnp.zeros(m1.shape, jnp.int32)
        for k in range(1, d):
            is_new = a[k] < m1
            m2 = jnp.where(is_new, m1, jnp.minimum(m2, a[k]))
            m1 = jnp.where(is_new, a[k], m1)
            pos = jnp.where(is_new, k, pos)
        if d == 1:
            m2 = jnp.zeros_like(m1)  # sole edge: empty leave-one-out
        outs = []
        for k in range(d):
            other = jnp.where(pos == k, m2, m1)
            res = jnp.maximum(
                jnp.float32(alpha) * other - jnp.float32(beta), 0.0)
            r = jax.lax.bitcast_convert_type(res, u32) | (sb[k] ^ X)
            outs.append(jax.lax.bitcast_convert_type(r, jnp.float32))
        _store_block(o_ref, jnp.stack(outs, axis=0), qscale)

    return kernel


def _vn_kernel_minsum(clamp: float, qscale: float, d: int):
    """Min-sum variable-node pass over one [d, T, lb] block: plain
    leave-one-out sums in f32 (no φ, no dtype routing), clamped; degree-1
    nodes emit clip(llr) exactly (see qc_pallas_grouped._vn_kernel_g)."""
    inv = 1.0 / qscale if qscale else 1.0

    def kernel(llr_ref, r_ref, o_ref, bits_ref):
        r = r_ref[...].astype(jnp.float32) * jnp.float32(inv)  # [d, T, lb]
        llr_t = llr_ref[...].astype(jnp.float32)
        tot = llr_t + jnp.sum(r, axis=0)
        if d == 1:
            pre = llr_t[None]
        else:
            pre = tot[None] - r
        _store_block(o_ref, jnp.clip(pre, -clamp, clamp), qscale)
        bits_ref[...] = (~jnp.signbit(tot)).astype(jnp.int8)

    return kernel


def _bucket_edges(x: jnp.ndarray, p: PlaneBucket) -> jnp.ndarray:
    """[d, count_pad, B] view of one bucket's plane-major edge rows (a
    free metadata reshape when the bucket is the whole array)."""
    n = p.degree * p.count_pad
    return x[p.edge_start : p.edge_start + n].reshape(
        p.degree, p.count_pad, x.shape[-1]
    )


def _assemble(parts, total_rows: int, starts, B: int, dtype) -> jnp.ndarray:
    """Concatenate per-bucket row regions (plus alignment filler) back
    into one flat padded array. Single-region arrays hit the zero-copy
    fast path."""
    if len(parts) == 1 and starts[0] == 0 and parts[0].shape[0] == total_rows:
        return parts[0]
    out, at = [], 0
    for start, part in zip(starts, parts):
        if start != at:
            out.append(jnp.zeros((start - at, B), dtype))
        out.append(part)
        at = start + part.shape[0]
    if at != total_rows:
        out.append(jnp.zeros((total_rows - at, B), dtype))
    return jnp.concatenate(out, axis=0)


def _whole_array(p: PlaneBucket, total_rows: int) -> bool:
    """True when one bucket's plane-major region IS the whole flat array
    (regular codes) — its [d, cp, B] view is a zero-copy reshape, so the
    kernel's edge input can donate its buffer to the same-shaped output
    (input_output_aliases). Halves the path's live edge-array count:
    the B=512 HBM squeeze (scripts/try_gp_b512.py)."""
    return p.edge_start == 0 and p.degree * p.count_pad == total_rows


def cn_update_general(
    m_c: jnp.ndarray,  # [ec_pad, B] VN→CN messages, cn plane-major order
    syn: jnp.ndarray,  # [nc_pad, B] int8 syndrome bits
    tables: GeneralPallasTables,
    phi_pre: float = PRE_THRESHOLD,
    alg: str = "sum-product",
    beta: float = 0.0,
    alpha=1.0,
    qscale: float = 4.0,
) -> jnp.ndarray:
    B = m_c.shape[-1]
    lb = _lane_block(B)
    high = _phi_high(m_c.dtype)
    is_q = m_c.dtype == jnp.int8
    parts = []
    for p in tables.cn_buckets:
        d, t, cp = p.degree, p.tile, p.count_pad
        grid = (cp // t, B // lb)
        alias = (
            {1: 0} if _whole_array(p, tables.ec_pad) else {}
        )
        if alg == "min-sum":
            kern = _cn_kernel_minsum(beta, resolve_minsum_alpha(alpha, d),
                                     qscale if is_q else 0.0, d)
        else:
            kern = _cn_kernel(high, phi_pre, m_c.dtype)
        out = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t, lb),
                             lambda i, l, _ns=p.node_start // t:
                             (_ns + i, l)),
                pl.BlockSpec((d, t, lb), lambda i, l: (0, i, l)),
            ],
            out_specs=pl.BlockSpec((d, t, lb), lambda i, l: (0, i, l)),
            out_shape=jax.ShapeDtypeStruct((d, cp, B), m_c.dtype),
            compiler_params=_compiler_params(len(grid)),
            interpret=_interpret(),
            input_output_aliases=alias,
        )(syn, _bucket_edges(m_c, p))
        parts.append(out.reshape(d * cp, B))
    return _assemble(parts, tables.ec_pad,
                     [p.edge_start for p in tables.cn_buckets], B,
                     m_c.dtype)


def vn_update_general(
    r_v: jnp.ndarray,  # [ev_pad, B] CN→VN messages, vn plane-major order
    llr: jnp.ndarray,  # [nv_pad, B] channel LLRs
    tables: GeneralPallasTables,
    phi_pre: float = PRE_THRESHOLD,
    msg_dtype=None,
    alg: str = "sum-product",
    clamp: float = 64.0,
    qscale: float = 4.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (new msgs_v [ev_pad, B], hard bits [nv_pad, B] int8)."""
    B = r_v.shape[-1]
    lb = _lane_block(B)
    dtype = msg_dtype or r_v.dtype
    high = _phi_high(dtype)
    is_q = jnp.dtype(dtype) == jnp.int8
    parts, bit_parts = [], []
    for p in tables.vn_buckets:
        d, t, cp = p.degree, p.tile, p.count_pad
        grid = (cp // t, B // lb)
        alias = (
            {1: 0}
            if _whole_array(p, tables.ev_pad) and r_v.dtype == dtype
            else {}
        )
        if alg == "min-sum":
            kern = _vn_kernel_minsum(clamp, qscale if is_q else 0.0, d)
        else:
            kern = _vn_kernel(high, phi_pre, dtype)
        out, bits = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((t, lb),
                             lambda i, l, _ns=p.node_start // t:
                             (_ns + i, l)),
                pl.BlockSpec((d, t, lb), lambda i, l: (0, i, l)),
            ],
            out_specs=[
                pl.BlockSpec((d, t, lb), lambda i, l: (0, i, l)),
                pl.BlockSpec((t, lb), lambda i, l: (i, l)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((d, cp, B), dtype),
                jax.ShapeDtypeStruct((cp, B), jnp.int8),
            ],
            compiler_params=_compiler_params(len(grid)),
            interpret=_interpret(),
            input_output_aliases=alias,
        )(llr, _bucket_edges(r_v, p))
        parts.append(out.reshape(d * cp, B))
        bit_parts.append(bits)
    msgs = _assemble(parts, tables.ev_pad,
                     [p.edge_start for p in tables.vn_buckets], B, dtype)
    all_bits = _assemble(bit_parts, tables.nv_pad,
                         [p.node_start for p in tables.vn_buckets], B,
                         jnp.int8)
    return msgs, all_bits


def parity_violations_general(
    bits: jnp.ndarray,  # [nv_pad, B] int8
    syn: jnp.ndarray,  # [nc_pad, B]
    tables: GeneralPallasTables,
) -> jnp.ndarray:
    """[B] bool: any real check violated (check_parity, flood.cu:191-223)."""
    bits_c = jnp.take(bits, tables.cn_edge_vnrow, axis=0)  # [ec_pad, B]
    viol = []
    for p in tables.cn_buckets:
        # accumulate the 0/1 bits in int8 (values <= degree): an int32
        # accumulator materializes a FULL edge-sized s32 temp before the
        # reduce — 9 GB at [3.1M, 768], the measured B=768 OOM
        # (scripts/out/try_gp_minsum_b768_oom.log); int8 keeps the only
        # edge-sized temp the gather output itself. Degrees > 126 would
        # overflow — no practical LDPC check is near that wide.
        acc = jnp.int8 if p.degree <= 126 else jnp.int32
        x = jnp.sum(_bucket_edges(bits_c, p), axis=0, dtype=acc)
        s = syn[p.node_start : p.node_start + p.count_pad].astype(acc)
        ok = tables.valid_c[p.node_start : p.node_start + p.count_pad]
        viol.append((((x + s) & 1) > 0) & ok)
    return jnp.any(jnp.concatenate(viol, axis=0), axis=0)


def init_messages_general(
    llr: jnp.ndarray,  # [nv_pad, B]
    tables: GeneralPallasTables,
    dtype=jnp.float32,
    phi_pre: float = PRE_THRESHOLD,
    alg: str = "sum-product",
    clamp: float = 64.0,
    qscale: float = 4.0,
) -> jnp.ndarray:
    """Fresh-frame init: every edge slot of a variable gets φ(llr) for
    sum-product, llr itself for min-sum (quantized for int8 storage)
    (flood_refill, flood.cu:297-323; qc_decode.init_messages_qc) — a
    contiguous plane broadcast in the VN layout, no gather."""
    if alg == "min-sum":
        if jnp.dtype(dtype) == jnp.int8:
            from ldpc_decoder_tpu.ops.qc_decode import quantize_msgs

            p_llr = quantize_msgs(
                jnp.clip(llr.astype(jnp.float32), -clamp, clamp), qscale)
        else:
            p_llr = llr.astype(dtype)
    else:
        p_llr = phi(llr.astype(jnp.float32), phi_pre)
    parts = []
    for p in tables.vn_buckets:
        rows = p_llr[p.node_start : p.node_start + p.count_pad]
        parts.append(
            jnp.broadcast_to(
                rows[None], (p.degree, p.count_pad, llr.shape[-1])
            ).reshape(p.degree * p.count_pad, -1).astype(dtype)
        )
    return _assemble(parts, tables.ev_pad,
                     [p.edge_start for p in tables.vn_buckets],
                     llr.shape[-1], dtype)


def _one_iteration(msgs_v, llr, syn, tables, phi_pre, alg="sum-product",
                   beta=0.0, clamp=64.0, alpha=1.0, qscale=4.0):
    m_c = jnp.take(msgs_v, tables.perm_v2c, axis=0)
    r_c = cn_update_general(m_c, syn, tables, phi_pre, alg, beta, alpha,
                            qscale)
    r_v = jnp.take(r_c, tables.perm_c2v, axis=0)
    return vn_update_general(r_v, llr, tables, phi_pre,
                             msg_dtype=msgs_v.dtype, alg=alg, clamp=clamp,
                             qscale=qscale)


@partial(jax.jit, static_argnames=("k", "phi_pre", "alg", "beta", "clamp",
                                   "alpha", "qscale"))
def run_iterations_general(
    msgs_v: jnp.ndarray,
    llr: jnp.ndarray,
    syn: jnp.ndarray,
    tables: GeneralPallasTables,
    k: int,
    phi_pre: float = PRE_THRESHOLD,
    alg: str = "sum-product",
    beta: float = 0.0,
    clamp: float = 64.0,
    alpha=1.0,
    qscale: float = 4.0,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """k flood iterations then a parity check; returns (msgs_v, bits,
    violated) — drop-in twin of ops/decode.run_iterations (including its
    min-sum mode)."""

    def body(_, carry):
        msgs, _ = carry
        return _one_iteration(msgs, llr, syn, tables, phi_pre, alg, beta,
                              clamp, alpha, qscale)

    bits0 = jnp.zeros((tables.nv_pad, llr.shape[-1]), jnp.int8)
    msgs_v, bits = jax.lax.fori_loop(0, k, body, (msgs_v, bits0))
    violated = parity_violations_general(bits, syn, tables)
    return msgs_v, bits, violated


@partial(jax.jit, static_argnames=("b", "phi_pre", "alg", "beta", "clamp",
                                   "alpha", "qscale"))
def burst_iterations_general(
    msgs_v: jnp.ndarray,
    llr: jnp.ndarray,
    syn: jnp.ndarray,
    tables: GeneralPallasTables,
    b: int,
    phi_pre: float = PRE_THRESHOLD,
    alg: str = "sum-product",
    beta: float = 0.0,
    clamp: float = 64.0,
    alpha=1.0,
    qscale: float = 4.0,
) -> jnp.ndarray:
    """b plain iterations, no parity check (delayed-first-check phase)."""

    def body(_, carry):
        msgs, _ = carry
        return _one_iteration(msgs, llr, syn, tables, phi_pre, alg, beta,
                              clamp, alpha, qscale)

    bits0 = jnp.zeros((tables.nv_pad, llr.shape[-1]), jnp.int8)
    msgs_v, _ = jax.lax.fori_loop(0, b, body, (msgs_v, bits0))
    return msgs_v
