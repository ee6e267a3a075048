"""Fused Pallas kernels for *irregular* QC-LDPC codes (grouped degrees).

Extends ops/qc_pallas.py beyond regular base matrices: check/variable nodes
are grouped by degree (the sorted orders from
:class:`ops.qc_decode.QCDecodeTables` already make each degree group a
contiguous range), and each group gets its own fused kernel launch with its
exact degree unrolled — no padding waste for the low-degree groups that
dominate optimized irregular ensembles (AR4JA, RU profiles).

Layout: circulant blocks live in flat ``[nb, Z, B]`` arrays — ``msgs_v``
ordered by (column, slot), ``r_c`` by (check row, slot); a group's blocks
are contiguous. Each per-group ``pallas_call`` writes only its slice of the
full flat array via ``input_output_aliases`` (the previous buffer is donated
and untouched blocks persist), so chaining groups costs no extra HBM
traffic; the iteration loop carries ``(msgs_v, r_c)`` and recycles both.

Rotated reads use the same seam/pair window mechanics as the regular
kernels (one aligned tile + halo blocks on seam-lattice codes, tile pairs
otherwise); see ops/qc_pallas.py for the co-design discussion.

Reference parity: the reference decoder supports arbitrary irregular codes
by walking per-node CSR degree offsets inside one kernel (flood.cu:117-158,
flood_vec2.cl:236-295, offsets built in ldpc_code.cpp:119-151). On TPU that
data-dependent walk defeats static tiling, so irregularity is compiled out
instead: same math, degree-specialized kernels.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_decoder_tpu.ops.qc_decode import (
    QCDecodeTables,
    resolve_minsum_alpha,
)
from ldpc_decoder_tpu.ops.phi import PRE_THRESHOLD
from ldpc_decoder_tpu.ops.qc_pallas import (
    MAX_SEAM,
    _compiler_params,
    _copysign_bits,
    _interpret,
    _lane_block,
    _phi_abs_f32,
    _phi_neg_f32,
    _pipeline_mode,
    _scratch_rows,
    _signed_fine,
)


def _ablate() -> frozenset:
    """Timing-only kernel ablations for the overlap investigation
    (scripts/micro_overlap5.py): LDPC_ABLATE=static_halo,no_votes,...
    WRONG RESULTS when set — never enable outside micro benchmarks."""
    import os

    return frozenset(
        x for x in os.environ.get("LDPC_ABLATE", "").split(",") if x)


def _group_tile_budget() -> int:
    """Max d_max*tile*msg_bytes for the grouped kernels. 16384 admits
    tile 1024 at d_max=8/bf16 under the raised 32 MiB scoped-VMEM limit
    (qc_pallas._compiler_params); codes whose coarse lattice is finer
    than the tile candidate fall back automatically via the seam
    feasibility check."""
    import os

    return int(os.environ.get("LDPC_GROUP_TILE_BUDGET", "16384"))


@dataclasses.dataclass(frozen=True)
class Group:
    node_start: int  # first sorted row/col of this degree group
    count: int       # number of nodes
    degree: int
    block_start: int  # first flat block index


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "cn_read",
        "vn_read",
        "cn_col_read",
        "vn_pos",
        "vn_order",
        "cn_order",
        "erased_mask_sorted",
    ],
    meta_fields=["n_vars", "n_checks", "n_edges", "Z", "nb", "nbv_pad",
                 "nbc_pad", "C", "R", "tile", "seam", "row_groups",
                 "col_groups"],
)
@dataclasses.dataclass(frozen=True)
class GroupedQCPallasTables:
    """Prefetch tables + group metadata for the grouped fused kernels.

    Flat block arrays are *padded*: each degree group's ``block_start`` is
    rounded up to a multiple of its degree so the per-group output
    BlockSpec (block = one node's d slots) can address it; padding blocks
    are never read or written (grids cover real nodes only).
    """

    n_vars: int
    n_checks: int
    n_edges: int
    Z: int
    nb: int       # real base edges (circulant blocks)
    nbv_pad: int  # padded vn-side flat blocks
    nbc_pad: int  # padded cn-side flat blocks
    C: int   # base columns
    R: int   # base rows
    tile: int
    seam: int  # halo rows per side (0 = tile-pair mode)
    row_groups: tuple[Group, ...]  # block_start values are padded
    col_groups: tuple[Group, ...]

    cn_read: jnp.ndarray  # [nbc_pad, 4] (padded src vn block, 0, toff, fine)
    vn_read: jnp.ndarray  # [nbv_pad, 4] (padded src cn block, 0, toff, fine)
    cn_col_read: jnp.ndarray  # [nbc_pad, 4] (sorted col, 0, toff, fine)

    vn_pos: jnp.ndarray
    vn_order: jnp.ndarray
    cn_order: jnp.ndarray
    erased_mask_sorted: jnp.ndarray

    @staticmethod
    def from_qc_tables(t: QCDecodeTables,
                       msg_bytes: int = 4) -> "GroupedQCPallasTables":
        Z = t.Z
        nb = t.n_blocks
        cn_shift = np.asarray(t.cn_shift).astype(np.int64)
        vn_of_cn = np.asarray(t.vn_of_cn).astype(np.int64)
        cn_of_vn = np.asarray(t.cn_of_vn).astype(np.int64)
        cn_col = np.asarray(t.cn_col_of_block).astype(np.int64)
        s_cn = cn_shift  # CN slot e reads msgs_v[vn_of_cn[e]] rotated +s
        s_vn = (-cn_shift[cn_of_vn]) % Z  # VN slot u reads r_c rotated -s

        # padded layouts: group starts rounded to multiples of the degree
        def pad_layout(block_groups):
            groups, pmap = [], np.zeros(nb, np.int64)
            node = 0
            pstart = 0
            for g in block_groups:
                d = g.degree
                pstart = -(-pstart // d) * d
                n_blk = g.count * d
                pmap[g.block_start : g.block_start + n_blk] = (
                    pstart + np.arange(n_blk)
                )
                groups.append(Group(node_start=node, count=g.count,
                                    degree=d, block_start=pstart))
                node += g.count
                pstart += n_blk
            return tuple(groups), pmap, pstart

        row_groups, pc, nbc_pad = pad_layout(t.row_groups)
        col_groups, pv, nbv_pad = pad_layout(t.col_groups)

        def decomp(s, tile, seam):
            NT = Z // tile
            if seam:
                b = _signed_fine(s, tile)
                return ((s - b) // tile) % NT, seam + b, int(np.abs(b).max())
            return (s // tile) % NT, s % tile, 0

        # seam mode with the largest feasible tile, else tile-pair mode;
        # VMEM budget: see _group_tile_budget
        budget = _group_tile_budget()
        d_max = max(g.degree for g in t.row_groups + t.col_groups)
        tile, seam = None, 0
        cand = 1024
        while cand >= 256 and d_max * cand * msg_bytes > budget:
            cand //= 2
        while cand >= 128:
            if Z % cand == 0:
                b_all = np.concatenate([
                    _signed_fine(s_cn, cand), _signed_fine(s_vn, cand)])
                need = int(np.abs(b_all).max()) + 1
                # seam must divide the tile (the halo BlockSpecs index
                # tile//seam sub-blocks) — power-of-two rounding + check,
                # in lockstep with qc_pallas.QCPallasTables.from_qc_tables
                sm = 8
                while sm < need:
                    sm *= 2
                if sm <= MAX_SEAM and sm <= cand // 8 and cand % sm == 0:
                    tile, seam = cand, sm
                    break
            cand //= 2
        if tile is None:
            tile = 512
            while Z % tile or d_max * tile * msg_bytes > budget:
                tile //= 2
            if tile < 32:
                raise ValueError(f"Z={Z} has no usable tile divisor")
            seam = 0

        def table(size, positions, srcs, shifts):
            toff, fine, _ = decomp(shifts, tile, seam)
            tab = np.zeros((size, 4), np.int64)
            tab[positions, 0] = srcs
            tab[positions, 2] = toff
            tab[positions, 3] = fine
            return jnp.asarray(tab.astype(np.int32))

        e = np.arange(nb)
        return GroupedQCPallasTables(
            n_vars=t.n_vars, n_checks=t.n_checks, n_edges=t.n_edges,
            Z=Z, nb=nb, nbv_pad=nbv_pad, nbc_pad=nbc_pad,
            C=t.n_vars // Z, R=t.n_checks // Z,
            tile=tile, seam=seam,
            row_groups=row_groups,
            col_groups=col_groups,
            cn_read=table(nbc_pad, pc[e], pv[vn_of_cn], s_cn),
            vn_read=table(nbv_pad, pv[e], pc[cn_of_vn], s_vn),
            cn_col_read=table(nbc_pad, pc[e], cn_col, s_cn),
            vn_pos=t.vn_pos, vn_order=t.vn_order, cn_order=t.cn_order,
            erased_mask_sorted=t.erased_mask_sorted,
        )


def _rot_specs_flat(d: int, tile: int, n_tiles: int, lb: int, seam: int,
                    block_start: int):
    """Rotated-window BlockSpecs for a flat [nb, Z, B] source; slot k of
    grid node i uses table row ``block_start + i*d + k``."""
    specs = []
    n_halo = tile // seam if seam else 0
    for k in range(d):
        if seam:
            def main_map(i, j, l, tab, _k=k):
                e = block_start + i * d + _k
                return (tab[e, 0], (tab[e, 2] + j) % n_tiles, l)

            def halo_map(i, j, l, tab, _k=k):
                # single sign-selected halo, as in qc_pallas._rot_in_specs
                e = block_start + i * d + _k
                is_next = tab[e, 3] >= seam
                m = (tab[e, 2] + j
                     + jnp.where(is_next, 1, n_tiles - 1)) % n_tiles
                return (tab[e, 0],
                        m * n_halo + jnp.where(is_next, 0, n_halo - 1), l)

            specs.append(pl.BlockSpec((1, tile, lb), main_map,
                                      memory_space=pltpu.VMEM,
                                      pipeline_mode=_pipeline_mode()))
            specs.append(pl.BlockSpec((1, seam, lb), halo_map,
                                      memory_space=pltpu.VMEM,
                                      pipeline_mode=_pipeline_mode()))
        else:
            for which in (0, 1):
                def index_map(i, j, l, tab, _k=k, _w=which):
                    e = block_start + i * d + _k
                    return (tab[e, 0], (tab[e, 2] + j + _w) % n_tiles, l)

                specs.append(pl.BlockSpec((1, tile, lb), index_map,
                                          memory_space=pltpu.VMEM,
                                          pipeline_mode=_pipeline_mode()))
    return specs


def _rps(seam: int) -> int:
    return 2


def _window_flat(refs, k, tab_ref, e_base, i, d, tile, seam, scratch,
                 inv_scale: float = 1.0):
    """Stage slot k's fetched blocks and cut the rotated T-row window.

    ``inv_scale``: dequantization factor for int8 fixed-point messages
    (exact in f32 when the scale is a power of two; ops/qc_decode.
    quantize_msgs) — applied while staging, so windows are plain LLRs.

    Every slot stages into its own scratch region (``scratch[k]``): the
    kernels keep all d window values live across the whole node update, and
    re-slicing one shared region after it was overwritten for the next slot
    is a WAR hazard once Mosaic defers the dynamic-offset loads (observed
    as slow state corruption on v5e with bf16 inputs).

    The scratch must stay fp32: a bf16 scratch (half the VMEM staging
    bytes) fails Mosaic compilation — packed-bf16 dynamic sublane slices
    need offsets provably multiple of 8, and the fine rotation offsets
    are arbitrary (measured round 3; ROADMAP dead-end table)."""
    # staging upcast + (int8 only) dequant; the multiply is emitted only
    # when a real scale exists — Mosaic does not fold x * 1.0, and the
    # folded form is bit-identical (x * 1.0 == x for every f32)
    if inv_scale != 1.0:
        sc = jnp.float32(inv_scale)

        def _stage(x):
            return x.astype(jnp.float32) * sc
    else:
        def _stage(x):
            return x.astype(jnp.float32)
    if seam:
        main, halo = refs[2 * k], refs[2 * k + 1]
        scratch[k, seam : seam + tile, :] = _stage(main[0])
        # sign-selected halo staged at the matching end (qc_pallas._window)
        if "static_halo" in _ablate():  # timing-only: wrong results
            scratch[k, 0:seam, :] = _stage(halo[0])
        else:
            pos = jnp.where(tab_ref[e_base + i * d + k, 3] >= seam,
                            seam + tile, 0)
            scratch[k, pl.ds(pos, seam), :] = _stage(halo[0])
    else:
        scratch[k, 0:tile, :] = _stage(refs[2 * k][0])
        scratch[k, tile : 2 * tile, :] = _stage(refs[2 * k + 1][0])
    if "static_fine" in _ablate():  # timing-only: wrong results
        return scratch[k, 0:tile, :]
    fine = tab_ref[e_base + i * d + k, 3]
    return scratch[k, pl.ds(fine, tile), :]


def _store_msg(out_ref, idx, val, qscale):
    """Write a message tile: quantize to int8 fixed-point when the output
    dtype is int8 (round-to-nearest-even, saturate ±127), plain cast
    otherwise — in lockstep with ops/qc_decode.quantize_msgs."""
    if out_ref.dtype == jnp.int8:
        q = jnp.clip(jnp.round(val * jnp.float32(qscale)), -127.0, 127.0)
        out_ref[idx] = q.astype(jnp.int8)
    else:
        out_ref[idx] = val.astype(out_ref.dtype)


def _cn_kernel_g(tab_ref, *refs, d: int, tile: int, seam: int, alg: str,
                 beta: float, block_start: int,
                 phi_pre: float = PRE_THRESHOLD, alpha: float = 1.0,
                 qscale: float = 0.0):
    """Grouped check-node update; refs = d slots, syn, prev-alias (ANY,
    unused), out [d, T, lb], scratch. ``qscale`` > 0: int8 fixed-point
    messages (dequantized at staging, re-quantized on write)."""
    r = _rps(seam)
    syn_ref = refs[r * d]
    out_ref = refs[r * d + 2]
    scratch = refs[r * d + 3]
    i = pl.program_id(0)
    inv = 1.0 / qscale if qscale else 1.0
    m = [_window_flat(refs, k, tab_ref, block_start, i, d, tile, seam,
                      scratch, inv) for k in range(d)]
    a = [jnp.abs(x) for x in m]
    # Sign algebra in the SIGN-BIT domain (u32 bitwise), not via int
    # compare/select or float ±1 products (both measured slower —
    # micro_overlap5/micro_kernel_split_r5b logs): with sb_k = sign bit
    # of m_k, the old votes/parity formula reduces to
    #   X       = (syn ⊕ d) << 31 ⊕ (⊕_j sb_j)
    #   sign_k  = sb_k ⊕ X
    #   out_k   = res_k | sign_k     (bitwise OR; res_k ≥ 0 so its sign
    #             bit is clear — exact, incl. ±0/inf)
    # because parity = (syn + d − #neg) mod 2 and #neg mod 2 = ⊕ sb_j.
    u32 = jnp.uint32
    sbit = jnp.uint32(0x80000000)
    sb = [jax.lax.bitcast_convert_type(x, u32) & sbit for x in m]
    # syn is 0/1 int8: its sign-bit contribution is syn << 31 (an i1-mask
    # where() here trips a Mosaic relayout bug on the remote compiler)
    X = syn_ref[0].astype(u32) << 31
    if d % 2:
        X = X ^ sbit
    if "no_votes" not in _ablate():  # timing-only knob: wrong when set
        for b in sb:
            X = X ^ b

    def signed(res, k):
        r = jax.lax.bitcast_convert_type(res, u32) | (sb[k] ^ X)
        return jax.lax.bitcast_convert_type(r, jnp.float32)

    # Sum-product also folds φ's leading negation into this algebra: φ is
    # evaluated in NEGATED form (log∘tanh / (−2)·exp — one VPU op fewer,
    # bitwise-exact sign flips of phi_abs, see _phi_neg_f32), so res
    # arrives with its sign bit SET; XOR-ing (sb_k ^ X ^ sbit) then both
    # clears it and installs the parity sign in one pass. Output bits are
    # identical to `signed(phi_abs(...), k)`.
    Xn = X ^ sbit

    def signed_neg(res_neg, k):
        r = jax.lax.bitcast_convert_type(res_neg, u32) ^ (sb[k] ^ Xn)
        return jax.lax.bitcast_convert_type(r, jnp.float32)

    if alg == "min-sum":
        m1 = a[0]
        m2 = jnp.full_like(a[0], jnp.inf)
        pos = jnp.zeros(a[0].shape, jnp.int32)
        for k in range(1, d):
            is_new = a[k] < m1
            m2 = jnp.where(is_new, m1, jnp.minimum(m2, a[k]))
            m1 = jnp.where(is_new, a[k], m1)
            pos = jnp.where(is_new, k, pos)
        if d == 1:
            m2 = jnp.zeros_like(m1)  # sole edge: empty leave-one-out
        for k in range(d):
            other = jnp.where(pos == k, m2, m1)
            res = jnp.maximum(
                jnp.float32(alpha) * other - jnp.float32(beta), 0.0)
            _store_msg(out_ref, k, signed(res, k), qscale)
    else:
        ext = a[0]
        for x in a[1:]:
            ext = ext + x
        for k in range(d):
            if "no_signs" in _ablate():  # timing-only: wrong results
                res = _phi_abs_f32(ext - a[k], pre=phi_pre)
                out_ref[k] = res.astype(out_ref.dtype)
                continue
            res_neg = _phi_neg_f32(ext - a[k], pre=phi_pre)
            out_ref[k] = signed_neg(res_neg, k).astype(out_ref.dtype)


def _vn_kernel_g(tab_ref, *refs, d: int, tile: int, seam: int,
                 emit_bits: bool, alg: str, clamp: float, block_start: int,
                 phi_pre: float = PRE_THRESHOLD, with_fresh: bool = False,
                 qscale: float = 0.0):
    """Grouped variable-node update; refs = d slots, llr, prev-alias (ANY),
    (fresh [8, lb] f32), out msgs [d, T, lb], (bits [1, T, lb]), scratch.

    ``with_fresh``: lane-reset refill — lanes flagged in the fresh operand
    emit the init message φ(llr)/clip(llr) (their carried state is a
    retired frame's; see runtime/decoder.py lane-reset refill)."""
    r = _rps(seam)
    llr_ref = refs[r * d]
    wf = 1 if with_fresh else 0
    fresh_ref = refs[r * d + 2] if with_fresh else None
    out_msgs = refs[r * d + 2 + wf]
    out_bits = refs[r * d + 3 + wf] if emit_bits else None
    scratch = refs[r * d + 3 + wf + (1 if emit_bits else 0)]
    i = pl.program_id(0)
    inv = 1.0 / qscale if qscale else 1.0
    w = [_window_flat(refs, k, tab_ref, block_start, i, d, tile, seam,
                      scratch, inv) for k in range(d)]
    llr_t = llr_ref[0].astype(jnp.float32)
    total = llr_t
    for x in w:
        total = total + x
    fr = (fresh_ref[0:1, :] > 0.0) if with_fresh else None
    if emit_bits:
        tb = jnp.where(fr, llr_t, total) if with_fresh else total
        out_bits[0] = (~jnp.signbit(tb)).astype(jnp.int8)
    for k in range(d):
        # sole edge: leave-one-out = channel LLR exactly (not total - w,
        # which can differ in low-order bits when llr + r rounds) — keeps
        # emit iterations bit-identical to the launch-skipped ones and to
        # the oracle's d==1 special case (qc_decode.vn_update_qc)
        if d == 1:
            pre = llr_t
        else:
            pre = total - w[k]
            if with_fresh:
                pre = jnp.where(fr, llr_t, pre)
        if alg == "min-sum":
            _store_msg(out_msgs, k, jnp.clip(pre, -clamp, clamp), qscale)
        else:
            out_msgs[k] = _copysign_bits(
                _phi_abs_f32(jnp.abs(pre), pre=phi_pre), pre
            ).astype(out_msgs.dtype)


def _parity_kernel_g(tab_ref, *refs, d: int, tile: int, seam: int,
                     block_start: int):
    r = _rps(seam)
    syn_ref = refs[r * d]
    out_ref = refs[r * d + 1]
    scratch = refs[r * d + 2]
    i = pl.program_id(0)
    acc = syn_ref[0].astype(jnp.int32)
    for k in range(d):
        if seam:
            main, halo = refs[2 * k], refs[2 * k + 1]
            scratch[k, seam : seam + tile, :] = main[0].astype(jnp.int32)
            pos = jnp.where(tab_ref[block_start + i * d + k, 3] >= seam,
                            seam + tile, 0)
            scratch[k, pl.ds(pos, seam), :] = halo[0].astype(jnp.int32)
        else:
            scratch[k, 0:tile, :] = refs[2 * k][0].astype(jnp.int32)
            scratch[k, tile : 2 * tile, :] = refs[2 * k + 1][0].astype(
                jnp.int32)
        acc = acc + scratch[k, pl.ds(tab_ref[block_start + i * d + k, 3],
                                     tile), :]
    viol = acc & 1
    out_ref[0, 0] = jnp.broadcast_to(
        jnp.max(viol, axis=0, keepdims=True), out_ref.shape[2:]
    ).astype(jnp.int8)


def _alias_index(num_prefetch: int, operand_pos: int) -> int:
    """input_output_aliases position: counts scalar-prefetch operands."""
    return num_prefetch + operand_pos


def cn_pass_grouped(msgs_v, syn3, r_c_prev, tables: GroupedQCPallasTables,
                    alg: str = "sum-product", beta: float = 0.0,
                    phi_pre: float = PRE_THRESHOLD, alpha=1.0,
                    qscale: float = 4.0):
    """msgs_v [nb, Z, B] (vn order), syn3 [R, Z, B] -> r_c [nb, Z, B]
    (check order); r_c_prev is donated and partially overwritten group by
    group."""
    T, Z, B = tables.tile, tables.Z, msgs_v.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    rps = _rps(tables.seam)
    r_c = r_c_prev
    for g in tables.row_groups:
        d = g.degree
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g.count, NT, B // lb),
            in_specs=_rot_specs_flat(d, T, NT, lb, tables.seam,
                                     g.block_start)
            + [
                pl.BlockSpec(
                    (1, T, lb),
                    lambda i, j, l, *_, _ns=g.node_start: (_ns + i, j, l),
                    memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),  # alias target
            ],
            out_specs=pl.BlockSpec(
                (d, T, lb),
                lambda i, j, l, *_, _bs=g.block_start // d: (_bs + i, j, l),
                memory_space=pltpu.VMEM,
                pipeline_mode=_pipeline_mode()),
            scratch_shapes=[
                pltpu.VMEM((d, _scratch_rows(T, tables.seam), lb),
                           jnp.float32)
            ],
        )
        r_c = pl.pallas_call(
            partial(_cn_kernel_g, d=d, tile=T, seam=tables.seam, alg=alg,
                    beta=beta, block_start=g.block_start, phi_pre=phi_pre,
                    alpha=resolve_minsum_alpha(alpha, d),
                    qscale=qscale if msgs_v.dtype == jnp.int8 else 0.0),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((tables.nbc_pad, Z, B),
                                           msgs_v.dtype),
            input_output_aliases={
                _alias_index(1, rps * d + 1): 0
            },
            compiler_params=_compiler_params(3),
            interpret=_interpret(),
        )(tables.cn_read, *([msgs_v] * (rps * d)), syn3, r_c)
    return r_c


def vn_pass_grouped(r_c, llr3, msgs_prev, tables: GroupedQCPallasTables,
                    emit_bits: bool, alg: str = "sum-product",
                    clamp: float = 64.0, phi_pre: float = PRE_THRESHOLD,
                    fresh8=None, include_d1: bool = False,
                    qscale: float = 4.0):
    """r_c [nb, Z, B] -> msgs_v [nb, Z, B] (+ per-group bits concat
    [C, Z, B] int8 when emit_bits); msgs_prev donated.

    ``fresh8`` ([8, B] f32, >0 = lane freshly refilled): lane-reset —
    fresh lanes emit init messages (kernel docstring). ``include_d1``
    runs the degree-1 groups even on non-emit iterations (their output
    φ(llr) depends only on llr, which changes at refill — one launch on
    the first iteration after a refill refreshes them for ALL lanes)."""
    T, Z, B = tables.tile, tables.Z, r_c.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    rps = _rps(tables.seam)
    with_fresh = fresh8 is not None
    msgs = msgs_prev
    bits_parts = []
    for g in tables.col_groups:
        d = g.degree
        if d == 1 and not emit_bits and not include_d1:
            # a degree-1 variable's outgoing message is φ(total - r) =
            # φ(llr): constant across iterations — its blocks were
            # initialized to exactly that (init_messages_qc_grouped) and
            # the aliased carry preserves them, so skip the launch (and
            # its read+write of the whole group) on non-emit iterations.
            # Emit iterations (and the first iteration after a refill,
            # include_d1) still run it.
            continue
        in_specs = _rot_specs_flat(d, T, NT, lb, tables.seam,
                                   g.block_start) + [
            pl.BlockSpec(
                (1, T, lb),
                lambda i, j, l, *_, _ns=g.node_start: (_ns + i, j, l),
                memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # alias target
        ]
        operands = [*([r_c] * (rps * d)), llr3, msgs]
        if with_fresh:
            in_specs.append(
                pl.BlockSpec((8, lb), lambda i, j, l, *_: (0, l),
                             memory_space=pltpu.VMEM))
            operands.append(fresh8)
        out_specs = [
            pl.BlockSpec(
                (d, T, lb),
                lambda i, j, l, *_, _bs=g.block_start // d: (_bs + i, j, l),
                memory_space=pltpu.VMEM,
                pipeline_mode=_pipeline_mode()),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((tables.nbv_pad, Z, B), r_c.dtype),
        ]
        if emit_bits:
            out_specs.append(
                pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                             memory_space=pltpu.VMEM))
            out_shape.append(
                jax.ShapeDtypeStruct((g.count, Z, B), jnp.int8))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g.count, NT, B // lb),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((d, _scratch_rows(T, tables.seam), lb),
                           jnp.float32)
            ],
        )
        out = pl.pallas_call(
            partial(_vn_kernel_g, d=d, tile=T, seam=tables.seam,
                    emit_bits=emit_bits, alg=alg, clamp=clamp,
                    block_start=g.block_start, phi_pre=phi_pre,
                    with_fresh=with_fresh,
                    qscale=qscale if r_c.dtype == jnp.int8 else 0.0),
            grid_spec=grid_spec,
            out_shape=out_shape,
            input_output_aliases={
                _alias_index(1, rps * d + 1): 0
            },
            compiler_params=_compiler_params(3),
            interpret=_interpret(),
        )(tables.vn_read, *operands)
        if emit_bits:
            msgs, bits_g = out
            bits_parts.append(bits_g)
        else:
            msgs = out[0] if isinstance(out, (list, tuple)) else out
    if emit_bits:
        return msgs, jnp.concatenate(bits_parts, axis=0)
    return msgs, None


def parity_pass_grouped(bits, syn3, tables: GroupedQCPallasTables):
    """bits [C, Z, B] int8 (sorted col blocks), syn3 [R, Z, B] -> [B]."""
    T, Z, B = tables.tile, tables.Z, bits.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    rps = _rps(tables.seam)
    flags = []
    for g in tables.row_groups:
        d = g.degree
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(g.count, NT, B // lb),
            in_specs=_rot_specs_flat(d, T, NT, lb, tables.seam,
                                     g.block_start)
            + [
                pl.BlockSpec(
                    (1, T, lb),
                    lambda i, j, l, *_, _ns=g.node_start: (_ns + i, j, l),
                    memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 8, lb), lambda i, j, l, *_: (i, j, 0, l),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((d, _scratch_rows(T, tables.seam), lb),
                           jnp.int32)
            ],
        )
        viol = pl.pallas_call(
            partial(_parity_kernel_g, d=d, tile=T, seam=tables.seam,
                    block_start=g.block_start),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((g.count, NT, 8, B), jnp.int8),
            compiler_params=_compiler_params(3),
            interpret=_interpret(),
        )(tables.cn_col_read, *([bits] * (rps * d)), syn3)
        flags.append(jnp.any(viol[:, :, 0] > 0, axis=(0, 1)))
    return jnp.any(jnp.stack(flags), axis=0)


def init_messages_qc_grouped(llr2d, tables: GroupedQCPallasTables,
                             dtype=jnp.float32, alg: str = "sum-product",
                             phi_pre: float = PRE_THRESHOLD,
                             clamp: float = 64.0, qscale: float = 4.0):
    """[E, B] fresh vn-order flat messages from sorted 2-D LLRs."""
    B = llr2d.shape[-1]
    llr = llr2d.reshape(tables.C, tables.Z, B).astype(jnp.float32)
    if alg == "min-sum":
        if dtype == jnp.int8:
            # int8 fixed-point init: quantize(clip(llr)) for EVERY column
            # — matches _store_msg's write in the VN kernel for any degree
            # (for d==1 pre = llr exactly), so the degree-1 launch skip
            # and the fresh-lane reset stay bit-identical
            from ldpc_decoder_tpu.ops.qc_decode import quantize_msgs

            p32 = jnp.clip(llr, -clamp, clamp)
            p = quantize_msgs(p32, qscale)
        else:
            p = llr
    else:
        p = jnp.copysign(_phi_abs_f32(jnp.abs(llr), pre=phi_pre), llr)
    # vn block u belongs to sorted column: expand per col group, with
    # zero padding blocks between groups (padded flat layout)
    parts = []
    pos = 0
    for g in tables.col_groups:
        if g.block_start > pos:
            parts.append(jnp.zeros(
                (g.block_start - pos, tables.Z, B), jnp.float32))
        cols = p[g.node_start : g.node_start + g.count]
        if alg == "min-sum" and g.degree == 1 and dtype != jnp.int8:
            # the degree-1 launch skip retains these init values as the
            # outgoing messages for all non-emit iterations — they must
            # equal what the VN kernel writes (clip(llr), _vn_kernel_g)
            cols = jnp.clip(cols, -clamp, clamp)
        parts.append(
            jnp.broadcast_to(
                cols[:, None], (g.count, g.degree, tables.Z, B)
            ).reshape(g.count * g.degree, tables.Z, B)
        )
        pos = g.block_start + g.count * g.degree
    m = jnp.concatenate(parts, axis=0).astype(dtype)
    # message state is the PAIR (msgs_v, r_c): carrying r_c across
    # supersteps (instead of a fresh jnp.zeros each superstep) saves a
    # full edge-array HBM write per superstep — its contents only need to
    # EXIST (every cn_pass fully rewrites all non-padding blocks before
    # any read)
    rc = jnp.zeros((tables.nbc_pad * tables.Z, B), dtype)
    return (m.reshape(tables.nbv_pad * tables.Z, B), rc)


@partial(jax.jit, static_argnames=("k", "alg", "beta", "clamp", "phi_pre",
                                   "alpha", "qscale"))
def run_iterations_qc_grouped(msgs2d, llr2d, syn2d,
                              tables: GroupedQCPallasTables, k: int,
                              alg: str = "sum-product", beta: float = 0.0,
                              clamp: float = 64.0,
                              phi_pre: float = PRE_THRESHOLD,
                              fresh=None, alpha=1.0, qscale: float = 4.0):
    """2-D-interface twin of run_iterations_qc_pallas for irregular bases.

    ``msgs2d`` is the (msgs_v, r_c) pair from init_messages_qc_grouped;
    both edge-sized buffers are carried across supersteps and recycled
    in place by the per-group aliased writes — no fresh allocations or
    zero-fills anywhere in the loop.

    ``fresh`` ([B] bool/int8 or None): lane-reset refill — flagged lanes
    carry a RETIRED frame's message state; the first iteration's VN pass
    emits init values for them (and refreshes the degree-1 groups, whose
    launches are otherwise skipped), so the runtime never touches the
    edge arrays at refill (runtime/decoder.py).
    """
    msgs2d, rc2d = msgs2d
    B = msgs2d.shape[-1]
    Z = tables.Z
    msgs = msgs2d.reshape(tables.nbv_pad, Z, B)
    # LLR staging dtype: bf16 floor for sub-byte message dtypes (fp8
    # messages keep bf16 LLRs — same ldt rule as run_iterations_qc_pallas)
    ldt = (jnp.bfloat16 if jnp.dtype(msgs.dtype).itemsize == 1
           else msgs.dtype)
    llr = llr2d.reshape(tables.C, Z, B).astype(ldt)
    syn = syn2d.reshape(tables.R, Z, B)
    r_c0 = rc2d.reshape(tables.nbc_pad, Z, B)

    def body(_, carry):
        m, rc = carry
        rc = cn_pass_grouped(m, syn, rc, tables, alg, beta, phi_pre, alpha,
                             qscale)
        m, _ = vn_pass_grouped(rc, llr, m, tables, emit_bits=False,
                               alg=alg, clamp=clamp, phi_pre=phi_pre,
                               qscale=qscale)
        return m, rc

    fresh8 = None
    if fresh is not None:
        fresh8 = jnp.broadcast_to(
            (fresh.reshape(-1) != 0).astype(jnp.float32)[None, :], (8, B))
    lo = 0
    r_c = r_c0
    if fresh is not None and k > 1:
        r_c = cn_pass_grouped(msgs, syn, r_c, tables, alg, beta, phi_pre,
                              alpha, qscale)
        msgs, _ = vn_pass_grouped(r_c, llr, msgs, tables, emit_bits=False,
                                  alg=alg, clamp=clamp, phi_pre=phi_pre,
                                  fresh8=fresh8, include_d1=True,
                                  qscale=qscale)
        lo = 1
    msgs, r_c = jax.lax.fori_loop(lo, k - 1, body, (msgs, r_c))
    r_c = cn_pass_grouped(msgs, syn, r_c, tables, alg, beta, phi_pre, alpha,
                          qscale)
    msgs, bits = vn_pass_grouped(
        r_c, llr, msgs, tables, emit_bits=True, alg=alg, clamp=clamp,
        phi_pre=phi_pre,
        fresh8=fresh8 if (fresh is not None and k == 1) else None,
        qscale=qscale)
    violated = parity_pass_grouped(bits, syn, tables)
    return (
        (msgs.reshape(tables.nbv_pad * Z, B),
         r_c.reshape(tables.nbc_pad * Z, B)),
        bits.reshape(tables.n_vars, B),
        violated,
    )


@partial(jax.jit, static_argnames=("b", "alg", "beta", "clamp", "phi_pre",
                                   "alpha", "qscale"))
def burst_iterations_qc_grouped(msgs2d, llr2d, syn2d,
                                tables: GroupedQCPallasTables, b: int,
                                alg: str = "sum-product", beta: float = 0.0,
                                clamp: float = 64.0,
                                phi_pre: float = PRE_THRESHOLD, alpha=1.0,
                                qscale: float = 4.0):
    """``b`` plain BP iterations with no hard-decision emit and no parity
    check — the delayed-first-parity-check phase (DynamicParams.
    num_iter_first_check). Bit-identical prefix of run_iterations_qc_grouped:
    burst(b) followed by run_iterations(k) equals run_iterations(b+k) on
    the message state and every emitted result (the degree-1 launch skip
    is invariant to emit frequency: those messages are constant φ(llr)).

    The reference has no analog — its host polls parity every fixed k
    (ldpc_decoder_gpu.cu:374); here skipping the early, provably-futile
    checks saves the emit pass (degree-1 groups + bits write) and the
    parity kernel per skipped superstep."""
    msgs2d, rc2d = msgs2d
    B = msgs2d.shape[-1]
    Z = tables.Z
    msgs = msgs2d.reshape(tables.nbv_pad, Z, B)
    ldt = (jnp.bfloat16 if jnp.dtype(msgs.dtype).itemsize == 1
           else msgs.dtype)
    llr = llr2d.reshape(tables.C, Z, B).astype(ldt)
    syn = syn2d.reshape(tables.R, Z, B)
    r_c = rc2d.reshape(tables.nbc_pad, Z, B)

    def body(_, carry):
        m, rc = carry
        rc = cn_pass_grouped(m, syn, rc, tables, alg, beta, phi_pre, alpha,
                             qscale)
        m, _ = vn_pass_grouped(rc, llr, m, tables, emit_bits=False,
                               alg=alg, clamp=clamp, phi_pre=phi_pre,
                               qscale=qscale)
        return m, rc

    msgs, r_c = jax.lax.fori_loop(0, b, body, (msgs, r_c))
    return (msgs.reshape(tables.nbv_pad * Z, B),
            r_c.reshape(tables.nbc_pad * Z, B))


def syndrome_from_bits_qc_grouped(bits2d, tables: GroupedQCPallasTables):
    """[n_checks, B] syndrome from sorted 2-D bits (datagen helper;
    XLA roll path — runs once per pool)."""
    B = bits2d.shape[-1]
    bits = bits2d.reshape(tables.C, tables.Z, B)
    T = tables.tile
    outs = []
    for g in tables.row_groups:
        sl = tables.cn_col_read[
            g.block_start : g.block_start + g.count * g.degree
        ]
        col = sl[:, 0]
        fine = sl[:, 3] - (tables.seam if tables.seam else 0)
        s = (sl[:, 2] * T + fine) % tables.Z
        blocks = jnp.take(bits, col, axis=0)
        rolled = jax.vmap(lambda xb, sb: jnp.roll(xb, -sb, axis=0))(
            blocks, s)
        x = jnp.sum(
            rolled.reshape(g.count, g.degree, tables.Z, B).astype(jnp.int32),
            axis=1,
        )
        outs.append((x & 1).astype(jnp.int8).reshape(-1, B))
    return jnp.concatenate(outs).reshape(tables.n_checks, B)
