"""Fused Pallas TPU kernels for QC-LDPC flood decoding.

The performance core of the framework (the analog of the reference's tuned
CUDA kernels, flood.cu:77-189, but designed for the TPU memory system):

- Messages are stored in *variable order* ``msgs_v [C, d_v, Z, B]`` —
  written aligned by the VN kernel, read rotated by the CN kernel; the
  CN->VN messages ``r_c [R, d_c, Z, B]`` are written aligned by the CN
  kernel and read rotated by the VN kernel.
- Each kernel fuses rotation + node update + φ into a single pass.

Rotated reads come in two flavours, chosen per code:

* **Seam mode** (``seam > 0``, the fast path): the code generator constrains
  every circulant shift to ``s ≡ b (mod tile)`` with ``|b| < seam`` (signed),
  see :func:`codes.qc.make_qc_structure`'s granularity parameters. A rotated
  T-row window then overlaps one aligned tile plus at most ``seam`` rows of
  ONE neighbour (which side follows the fine shift's sign, resolved inside
  the scalar-prefetch index maps), so the kernel fetches one T-row tile and
  a single seam-row halo block per slot (≈3% extra HBM traffic, 2 DMA
  streams) instead of a full tile pair (100% extra). This is hardware/code co-design: the shift lattice is chosen for
  the TPU memory system, and the fine ±b components still break graph
  symmetry (any short cycle needs its fine parts to cancel *exactly*, since
  coarse parts are multiples of the tile — so the restriction also acts as a
  cycle sieve).
* **Pair mode** (``seam == 0``, the general path): arbitrary shifts; a
  window starting anywhere within a circulant is covered by two consecutive
  T-row tiles fetched through the normal Pallas pipeline via
  scalar-prefetched index maps, then cut out with one dynamic-start
  static-size slice in VMEM.

In both modes the dynamic-start slice goes through an f32 VMEM scratch:
Mosaic has no value-level dynamic_slice, and dynamic sublane offsets are
not supported for packed dtypes (bf16) — the upcast is needed for compute
anyway.

This module handles regular base matrices (single check/variable degree);
irregular bases use the grouped twin in ops/qc_pallas_grouped.py (one
fused kernel launch per degree group). ops/qc_decode.py is the XLA
correctness oracle for both.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_decoder_tpu.ops.phi import (
    HIGH_THRESHOLD,
    PRE_THRESHOLD,
    TAYLOR_LIMIT,
)
from ldpc_decoder_tpu.ops.qc_decode import (
    QCDecodeTables,
    resolve_minsum_alpha,
)

MAX_SEAM = 64  # max halo rows per side in seam mode (12.5% of a 1024 tile)


def _tile_budget() -> int:
    """Max d_max*tile*msg_bytes fitting the scoped-VMEM limit (measured on
    v5e at the default 16 MiB limit; override together with
    LDPC_VMEM_LIMIT_MB to trade VMEM for larger tiles/DMAs)."""
    import os

    return int(os.environ.get("LDPC_TILE_BUDGET", "12288"))


# φ input clamp per message storage dtype: keeps φ(x) a *normal* value of
# the storage type so the sign always survives (see ops/phi.py). fp8 e5m2
# (min normal 6.1e-5) needs the reference's own infinity threshold of 10
# (φ(10) = 9.1e-5, ldpc_decoder_gpu_common.h:27-30).
PHI_HIGH_BY_DTYPE = {"float8_e5m2": 10.0}


def _phi_high(dtype) -> float:
    return PHI_HIGH_BY_DTYPE.get(jnp.dtype(dtype).name, HIGH_THRESHOLD)


def _phi_abs_f32(x, high: float = HIGH_THRESHOLD,
                 pre: float = PRE_THRESHOLD):
    # same formula as ops/phi.py phi_abs (kept in lockstep so the
    # XLA-oracle equality tests stay exact); ``pre`` realizes the runtime
    # infinity threshold (phi.pre_from_infinity_threshold). The x > 5
    # Taylor branch is REQUIRED on TPU: the v5e hw tanh saturates to 1.0
    # for arguments >= ~5.5 (phi would return -0.0 and decoding floors;
    # measured round 3, ops/phi.py docstring)
    xm = jnp.clip(x, jnp.float32(pre), jnp.float32(high))
    main = -jnp.log(jnp.tanh(xm * jnp.float32(0.5)))
    return jnp.where(xm > TAYLOR_LIMIT, 2.0 * jnp.exp(-xm), main)


def _phi_neg_f32(x, high: float = HIGH_THRESHOLD,
                 pre: float = PRE_THRESHOLD):
    """−phi_abs(x), computed one VPU op cheaper: the main branch drops the
    negation (log instead of −log) and the Taylor branch folds it into the
    constant ((−2)·e^{−x}). Both are exact sign flips of _phi_abs_f32's
    branches, so ``-_phi_neg_f32(x) == _phi_abs_f32(x)`` bit-for-bit.
    Every output has its sign bit SET (log(tanh)<0 for the selected
    x ≤ 5 range on both CPU and TPU backends; (−2)·e^{−x} < 0, −0.0 at
    worst), which the callers' sign-restore XOR relies on
    (qc_pallas_grouped._cn_kernel_g signed_neg)."""
    xm = jnp.clip(x, jnp.float32(pre), jnp.float32(high))
    main = jnp.log(jnp.tanh(xm * jnp.float32(0.5)))
    return jnp.where(xm > TAYLOR_LIMIT, -2.0 * jnp.exp(-xm), main)


def _copysign_bits(mag, src):
    """copysign(mag, src) for mag >= 0 f32 via sign-bit OR — measured
    cheaper on the v5e VPU than jnp.copysign / float ±1 products / the
    int signbit-xor-select chain (scripts/out/micro_kernel_split_r5*,
    micro_overlap5 logs). Exact: mag's sign bit is clear, so OR-ing
    src's sign bit reproduces copysign for every value incl. ±0/inf."""
    u32 = jnp.uint32
    b = jax.lax.bitcast_convert_type(mag, u32) | (
        jax.lax.bitcast_convert_type(src, u32) & jnp.uint32(0x80000000))
    return jax.lax.bitcast_convert_type(b, jnp.float32)


def _signed_fine(s: np.ndarray, tile: int) -> np.ndarray:
    """s mod tile, mapped to the signed window [-tile/2, tile/2)."""
    b = s % tile
    return np.where(b >= tile // 2, b - tile, b)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "cn_read",
        "vn_read",
        "vn_pos",
        "vn_order",
        "cn_order",
        "erased_mask_sorted",
    ],
    meta_fields=["n_vars", "n_checks", "n_edges", "Z", "C", "R", "d_v",
                 "d_c", "tile", "seam"],
)
@dataclasses.dataclass(frozen=True)
class QCPallasTables:
    """Static + prefetch tables for the fused kernels (regular base).

    ``cn_read[r, k]`` / ``vn_read[c, i]`` = (src_node, src_slot, tile_off,
    fine): reading slot k of node r means taking the window of
    ``src[src_node, src_slot]`` rotated by its circulant shift; ``tile_off``
    is the coarse tile offset and ``fine`` the in-scratch slice start
    (seam mode: ``seam + b``; pair mode: ``s % tile``).
    """

    n_vars: int
    n_checks: int
    n_edges: int
    Z: int
    C: int
    R: int
    d_v: int
    d_c: int
    tile: int  # T — rows per pipeline tile; Z % T == 0
    seam: int  # SEAM (halo mode) or 0 (tile-pair mode)

    cn_read: jnp.ndarray  # [R, d_c, 4] int32
    vn_read: jnp.ndarray  # [C, d_v, 4] int32

    # 2-D runtime interface (same duck type as QCDecodeTables)
    vn_pos: jnp.ndarray
    vn_order: jnp.ndarray
    cn_order: jnp.ndarray
    erased_mask_sorted: jnp.ndarray

    @staticmethod
    def from_qc_tables(
        t: QCDecodeTables, tile: int | None = None, msg_bytes: int = 4
    ) -> "QCPallasTables":
        if len(t.row_groups) != 1 or len(t.col_groups) != 1:
            raise ValueError(
                "fused kernels currently require a regular base matrix"
            )
        d_c = t.row_groups[0].degree
        d_v = t.col_groups[0].degree
        R = t.row_groups[0].count
        C = t.col_groups[0].count
        Z = t.Z

        vn_of_cn = np.asarray(t.vn_of_cn)
        cn_of_vn = np.asarray(t.cn_of_vn)
        cn_shift = np.asarray(t.cn_shift).astype(np.int64)
        u = vn_of_cn.reshape(R, d_c)
        s_cn = cn_shift.reshape(R, d_c)  # CN reads msgs_v rotated +s
        tt = cn_of_vn.reshape(C, d_v)
        s_vn = (-cn_shift[cn_of_vn].reshape(C, d_v)) % Z  # VN reads -s

        # seam mode: the largest tile dividing Z for which every shift's
        # signed fine part fits within MAX_SEAM halo rows. The halo
        # BlockSpecs address halo blocks as tile//seam sub-blocks per tile,
        # so seam MUST divide the tile exactly — round it up to a power of
        # two (>= the 8-row f32 sublane granule) and check divisibility.
        def seam_tables(T):
            NT = Z // T
            b_cn = _signed_fine(s_cn, T)
            b_vn = _signed_fine(s_vn, T)
            b_max = int(max(np.abs(b_cn).max(), np.abs(b_vn).max()))
            seam = 8
            while seam < b_max + 1:
                seam *= 2
            if seam > MAX_SEAM or seam > T // 8 or T % seam:
                return None

            def tab(srcs, slots, s, b):
                c = ((s - b) // T) % NT
                return np.stack(
                    [srcs, slots, c.astype(np.int64), seam + b], axis=-1
                ).astype(np.int32)

            return (tab(u // d_v, u % d_v, s_cn, b_cn),
                    tab(tt // d_c, tt % d_c, s_vn, b_vn), seam)

        # largest tile whose double-buffered blocks fit the 16 MiB scoped
        # VMEM budget (measured on v5e: the widest node's blocks fit iff
        # d_max*tile*msg_bytes <= 12288 with the shared staging scratch)
        d_max = max(d_c, d_v)
        budget = _tile_budget()
        cand = 1024 * max(1, budget // 12288)
        while cand >= 256 and d_max * cand * msg_bytes > budget:
            cand //= 2
        while cand >= 128:
            if Z % cand == 0:
                st = seam_tables(cand)
                if st is not None:
                    return QCPallasTables(
                        n_vars=t.n_vars, n_checks=t.n_checks,
                        n_edges=t.n_edges, Z=Z, C=C, R=R, d_v=d_v, d_c=d_c,
                        tile=cand, seam=st[2],
                        cn_read=jnp.asarray(st[0]),
                        vn_read=jnp.asarray(st[1]),
                        vn_pos=t.vn_pos, vn_order=t.vn_order,
                        cn_order=t.cn_order,
                        erased_mask_sorted=t.erased_mask_sorted,
                    )
            cand //= 2

        # pair mode fallback (arbitrary shifts)
        if tile is None:
            tile = 512
        while Z % tile or max(d_c, d_v) * tile * msg_bytes > _tile_budget():
            tile //= 2
        if tile < 32:
            raise ValueError(f"Z={Z} has no usable tile divisor (>=32)")
        Zt = Z // tile

        def pair_tab(srcs, slots, s):
            return np.stack(
                [srcs, slots, (s // tile) % Zt, s % tile], axis=-1
            ).astype(np.int32)

        return QCPallasTables(
            n_vars=t.n_vars, n_checks=t.n_checks, n_edges=t.n_edges,
            Z=Z, C=C, R=R, d_v=d_v, d_c=d_c, tile=tile, seam=0,
            cn_read=jnp.asarray(pair_tab(u // d_v, u % d_v, s_cn)),
            vn_read=jnp.asarray(pair_tab(tt // d_c, tt % d_c, s_vn)),
            vn_pos=t.vn_pos, vn_order=t.vn_order, cn_order=t.cn_order,
            erased_mask_sorted=t.erased_mask_sorted,
        )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _compiler_params(n_grid_dims: int):
    """Per-kernel Mosaic knobs, env-tunable for experiments.

    LDPC_VMEM_LIMIT_MB raises the scoped-VMEM limit for THESE kernels only
    (the supported per-payload route; the global LIBTPU flag is not usable
    under a remote compiler). LDPC_DIM_PARALLEL=1 declares the grid dims
    independent (they are: each step writes a distinct output block).
    """
    import os

    kw = {}
    # default 32 MiB (device default is 16): the per-slot staging scratch
    # (the WAR-hazard fix, see _window) needs d_max*(tile+2*seam)*lb*4
    # bytes — 3.5 MiB at d_c=6/tile=1024 — which overflows the 16 MiB
    # scoped budget at the flagship tile. Verified safe on v5e up to 64 MiB
    # (total VMEM 128 MiB).
    mb = os.environ.get("LDPC_VMEM_LIMIT_MB", "32")
    if mb:
        kw["vmem_limit_bytes"] = int(float(mb) * 1024 * 1024)
    if os.environ.get("LDPC_DIM_PARALLEL"):
        kw["dimension_semantics"] = ("parallel",) * n_grid_dims
    return pltpu.CompilerParams(**kw) if kw else None


def _pipeline_mode():
    """LDPC_BUF_COUNT=n (n>2): n-deep multiple buffering on the message
    BlockSpecs — more outstanding DMAs per operand stream (experiment
    knob; per-stream DMA measured ~30-40 GB/s at the default depth,
    scripts/micro_overlap4.py)."""
    import os

    n = int(os.environ.get("LDPC_BUF_COUNT", "0"))
    if n > 2:
        look = os.environ.get("LDPC_BUF_LOOKAHEAD", "0") == "1"
        return pl.Buffered(buffer_count=n, use_lookahead=look)
    return None


LANE_BLOCK = 128  # frames per kernel block; keeps Mosaic's unaligned
# dynamic sublane slicing happy and bounds VMEM for any batch width


def _lane_block(B: int) -> int:
    """128 lanes per block on real batches; small test batches use B.
    LDPC_LANE_BLOCK widens the per-block batch slice (bigger DMAs) —
    needs LDPC_VMEM_LIMIT_MB raised proportionally."""
    import os

    lb = int(os.environ.get("LDPC_LANE_BLOCK", LANE_BLOCK))
    return lb if B % lb == 0 else B


def _rot_in_specs(d: int, tile: int, n_tiles: int, lb: int, seam: int):
    """BlockSpecs reading the rotated windows of a [N0, N1, Z, B] array per
    the scalar-prefetch table (arg 0). Grid = (nodes, z-tiles, lane-blocks).

    Seam mode: 3 specs/slot — prev-halo [seam rows], main [tile rows],
    next-halo [seam rows]. Pair mode: 2 specs/slot — consecutive tiles.
    """
    specs = []
    n_halo = tile // seam if seam else 0
    for k in range(d):
        if seam:
            def main_map(i, j, l, tab, _k=k):
                return (tab[i, _k, 0], tab[i, _k, 1],
                        (tab[i, _k, 2] + j) % n_tiles, l)

            def halo_map(i, j, l, tab, _k=k):
                # the window [fine, fine+tile) (fine = tab[...,3] - seam,
                # signed) spills into exactly ONE neighbour: the next
                # tile's first seam rows when fine >= 0, the previous
                # tile's last seam rows otherwise — pick the block here so
                # only that one is fetched (2 DMA streams per slot, not 3)
                is_next = tab[i, _k, 3] >= seam
                m = (tab[i, _k, 2] + j
                     + jnp.where(is_next, 1, n_tiles - 1)) % n_tiles
                blk = m * n_halo + jnp.where(is_next, 0, n_halo - 1)
                return (tab[i, _k, 0], tab[i, _k, 1], blk, l)

            specs.append(pl.BlockSpec((1, 1, tile, lb), main_map,
                                      memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec((1, 1, seam, lb), halo_map,
                                      memory_space=pltpu.VMEM))
        else:
            for which in (0, 1):
                def index_map(i, j, l, tab, _k=k, _w=which):
                    t0 = tab[i, _k, 2] + j + _w
                    return (tab[i, _k, 0], tab[i, _k, 1], t0 % n_tiles, l)

                specs.append(
                    pl.BlockSpec((1, 1, tile, lb), index_map,
                                 memory_space=pltpu.VMEM)
                )
    return specs


def _refs_per_slot(seam: int) -> int:
    return 2


def _window(refs, k: int, tab_ref, i, tile: int, seam: int, scratch):
    """Cut the rotated T-row window of slot k out of its fetched blocks.

    Mosaic has no value-level dynamic_slice; stage the blocks through a VMEM
    scratch ref and use dynamic-start ref indexing instead. The scratch is
    always f32: dynamic sublane offsets are not supported for packed dtypes
    (bf16), and the upcast is needed for compute anyway.

    Every slot stages into its own scratch region (``scratch[k]``): the
    kernels keep all d window values live across the whole node update, and
    re-slicing one shared region after it was overwritten for the next slot
    is a WAR hazard once Mosaic defers the dynamic-offset loads (observed
    as silent state corruption on v5e — same fix as _window_flat in
    ops/qc_pallas_grouped.py).
    """
    if seam:
        main, halo = refs[2 * k], refs[2 * k + 1]
        scratch[k, seam : seam + tile, :] = main[0, 0].astype(jnp.float32)
        # the fetched halo block (see halo_map) goes before or after the
        # main tile depending on the window's sign; the slice below never
        # touches the other side, so its stale contents are harmless
        pos = jnp.where(tab_ref[i, k, 3] >= seam, seam + tile, 0)
        scratch[k, pl.ds(pos, seam), :] = halo[0, 0].astype(jnp.float32)
    else:
        scratch[k, 0:tile, :] = refs[2 * k][0, 0].astype(jnp.float32)
        scratch[k, tile : 2 * tile, :] = (
            refs[2 * k + 1][0, 0].astype(jnp.float32)
        )
    s_fine = tab_ref[i, k, 3]
    return scratch[k, pl.ds(s_fine, tile), :]


def _scratch_rows(tile: int, seam: int) -> int:
    return tile + 2 * seam if seam else 2 * tile


def _cn_kernel(tab_ref, *refs, d_c: int, tile: int, seam: int, alg: str,
               beta: float, phi_high: float, phi_pre: float,
               alpha: float = 1.0):
    """Check-node update (flood_backward) with rotated reads.

    refs = d_c slots' message blocks, syndrome tile, output [1, d_c, T, B],
    scratch. ``alg``: "sum-product" (φ chain) or "min-sum" (offset
    two-minimum leave-one-out, no transcendentals).
    """
    rps = _refs_per_slot(seam)
    syn_ref = refs[rps * d_c]
    out_ref = refs[rps * d_c + 1]
    pair_scratch = refs[rps * d_c + 2]
    i = pl.program_id(0)
    m = [
        _window(refs, k, tab_ref, i, tile, seam, pair_scratch)
        for k in range(d_c)
    ]
    a = [jnp.abs(x) for x in m]
    # sign-bit-domain parity algebra (cheapest measured form; identity
    # and measurements: qc_pallas_grouped._cn_kernel_g)
    u32 = jnp.uint32
    sbit = jnp.uint32(0x80000000)
    sb = [jax.lax.bitcast_convert_type(x, u32) & sbit for x in m]
    X = syn_ref[0].astype(u32) << 31
    if d_c % 2:
        X = X ^ sbit
    for b in sb:
        X = X ^ b

    def signed(res, k):
        r = jax.lax.bitcast_convert_type(res, u32) | (sb[k] ^ X)
        return jax.lax.bitcast_convert_type(r, jnp.float32)

    if alg == "min-sum":
        m1 = a[0]
        m2 = jnp.full_like(a[0], jnp.inf)
        pos = jnp.zeros(a[0].shape, jnp.int32)
        for k in range(1, d_c):
            is_new = a[k] < m1
            m2 = jnp.where(is_new, m1, jnp.minimum(m2, a[k]))
            m1 = jnp.where(is_new, a[k], m1)
            pos = jnp.where(is_new, k, pos)
        for k in range(d_c):
            other = jnp.where(pos == k, m2, m1)
            res = jnp.maximum(
                jnp.float32(alpha) * other - jnp.float32(beta), 0.0)
            out_ref[0, k] = signed(res, k).astype(out_ref.dtype)
    else:
        ext = a[0]
        for x in a[1:]:
            ext = ext + x
        for k in range(d_c):
            res = _phi_abs_f32(ext - a[k], phi_high, phi_pre)
            out_ref[0, k] = signed(res, k).astype(out_ref.dtype)


def _vn_kernel(tab_ref, *refs, d_v: int, tile: int, seam: int,
               emit_bits: bool, alg: str, clamp: float, phi_high: float,
               phi_pre: float, with_fresh: bool = False):
    """Variable-node update (flood_forward) with rotated reads.

    refs = d_v slots' r_c blocks, llr tile, (fresh [8, lb] f32), then out
    refs (msgs_v [1, d_v, T, B] and, when emit_bits, hard decisions
    [1, T, B] int8 — the flood_forward_w_final_bits analog,
    flood.cu:159-189). ``with_fresh``: lane-reset refill — flagged lanes
    emit init messages (see qc_pallas_grouped._vn_kernel_g).
    """
    rps = _refs_per_slot(seam)
    llr_ref = refs[rps * d_v]
    wf = 1 if with_fresh else 0
    fresh_ref = refs[rps * d_v + 1] if with_fresh else None
    out_msgs = refs[rps * d_v + 1 + wf]
    out_bits = refs[rps * d_v + 2 + wf] if emit_bits else None
    pair_scratch = refs[rps * d_v + 2 + wf + (1 if emit_bits else 0)]
    i = pl.program_id(0)
    r = [
        _window(refs, k, tab_ref, i, tile, seam, pair_scratch)
        for k in range(d_v)
    ]
    llr_t = llr_ref[0].astype(jnp.float32)
    total = llr_t
    for x in r:
        total = total + x
    fr = (fresh_ref[0:1, :] > 0.0) if with_fresh else None
    if emit_bits:
        tb = jnp.where(fr, llr_t, total) if with_fresh else total
        out_bits[0] = (~jnp.signbit(tb)).astype(jnp.int8)
    for k in range(d_v):
        pre = total - r[k]
        if with_fresh:
            pre = jnp.where(fr, llr_t, pre)
        if alg == "min-sum":
            out_msgs[0, k] = jnp.clip(pre, -clamp, clamp).astype(
                out_msgs.dtype)
        else:
            out_msgs[0, k] = _copysign_bits(
                _phi_abs_f32(jnp.abs(pre), phi_high, phi_pre), pre
            ).astype(out_msgs.dtype)


def cn_pass(msgs_v, syn3, tables: QCPallasTables, alg: str = "sum-product",
            beta: float = 0.0, phi_pre: float = PRE_THRESHOLD, alpha=1.0):
    """msgs_v [C, d_v, Z, B], syn3 [R, Z, B] -> r_c [R, d_c, Z, B]."""
    T, Z, B = tables.tile, tables.Z, msgs_v.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    rps = _refs_per_slot(tables.seam)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tables.R, NT, B // lb),
        in_specs=_rot_in_specs(tables.d_c, T, NT, lb, tables.seam)
        + [
            pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tables.d_c, T, lb),
            lambda i, j, l, *_: (i, 0, j, l),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM(
                (tables.d_c, _scratch_rows(T, tables.seam), lb), jnp.float32
            )
        ],
    )
    return pl.pallas_call(
        partial(_cn_kernel, d_c=tables.d_c, tile=T, seam=tables.seam,
                alg=alg, beta=beta, phi_high=_phi_high(msgs_v.dtype),
                phi_pre=phi_pre,
                alpha=resolve_minsum_alpha(alpha, tables.d_c)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (tables.R, tables.d_c, Z, B), msgs_v.dtype
        ),
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )(tables.cn_read, *([msgs_v] * (rps * tables.d_c)), syn3)


def vn_pass(r_c, llr3, tables: QCPallasTables, emit_bits: bool = True,
            alg: str = "sum-product", clamp: float = 64.0,
            phi_pre: float = PRE_THRESHOLD, fresh8=None):
    """r_c [R, d_c, Z, B], llr3 [C, Z, B] -> msgs_v [C, d_v, Z, B]
    (+ hard decisions [C, Z, B] int8 when emit_bits). ``fresh8``
    ([8, B] f32 or None): lane-reset refill (see _vn_kernel)."""
    T, Z, B = tables.tile, tables.Z, r_c.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    rps = _refs_per_slot(tables.seam)
    with_fresh = fresh8 is not None
    out_specs = [
        pl.BlockSpec(
            (1, tables.d_v, T, lb),
            lambda i, j, l, *_: (i, 0, j, l),
            memory_space=pltpu.VMEM,
        ),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((tables.C, tables.d_v, Z, B), r_c.dtype),
    ]
    if emit_bits:
        out_specs.append(
            pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((tables.C, Z, B), jnp.int8)
        )
    in_specs = _rot_in_specs(tables.d_v, T, NT, lb, tables.seam) + [
        pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                     memory_space=pltpu.VMEM),
    ]
    operands = [*([r_c] * (rps * tables.d_v)), llr3]
    if with_fresh:
        in_specs.append(pl.BlockSpec((8, lb), lambda i, j, l, *_: (0, l),
                                     memory_space=pltpu.VMEM))
        operands.append(fresh8)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tables.C, NT, B // lb),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM(
                (tables.d_v, _scratch_rows(T, tables.seam), lb), jnp.float32
            )
        ],
    )
    out = pl.pallas_call(
        partial(_vn_kernel, d_v=tables.d_v, tile=T, seam=tables.seam,
                emit_bits=emit_bits, alg=alg, clamp=clamp,
                phi_high=_phi_high(r_c.dtype), phi_pre=phi_pre,
                with_fresh=with_fresh),
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )(tables.vn_read, *operands)
    return out if emit_bits else (out[0], None)


def init_messages_qc_pallas(llr2d, tables: QCPallasTables,
                            dtype=jnp.float32, alg: str = "sum-product",
                            phi_pre: float = PRE_THRESHOLD):
    """VN-layout init: every slot of a variable gets φ(llr) (or the llr
    itself for min-sum) — aligned, no rotation needed (unlike CN-layout
    init)."""
    B = llr2d.shape[-1]
    llr = llr2d.reshape(tables.C, tables.Z, B).astype(jnp.float32)
    if alg == "min-sum":
        p = llr.astype(dtype)
    else:
        p = jnp.copysign(
            _phi_abs_f32(jnp.abs(llr), _phi_high(dtype), phi_pre), llr
        ).astype(dtype)
    m = jnp.broadcast_to(
        p[:, None], (tables.C, tables.d_v, tables.Z, B)
    )
    return m.reshape(tables.n_edges, B)


@partial(jax.jit, static_argnames=("k", "alg", "beta", "clamp", "phi_pre",
                                   "alpha"))
def run_iterations_qc_pallas(msgs2d, llr2d, syn2d, tables: QCPallasTables,
                             k: int, alg: str = "sum-product",
                             beta: float = 0.0, clamp: float = 64.0,
                             phi_pre: float = PRE_THRESHOLD,
                             fresh=None, alpha=1.0):
    """2-D-interface twin of ops.decode.run_iterations (msgs in VN layout).

    The k-iteration superstep: k-1 light iterations (messages only), then a
    final iteration that also emits int8 hard decisions (consumed only every
    k iterations — emitting f32 totals each iteration would waste an
    n_vars-sized HBM pass), then the fused parity kernel.

    ``fresh`` ([B] bool/int8 or None): lane-reset refill — flagged lanes
    carry a retired frame's messages; the first iteration's VN emits init
    values for them (runtime/decoder.py).
    """
    B = msgs2d.shape[-1]
    Z, C, R = tables.Z, tables.C, tables.R
    msgs = msgs2d.reshape(C, tables.d_v, Z, B)
    # channel LLRs are consumed in the message dtype (the reference's fp16
    # path stores fp16 LLRs, common.h:13-34); bf16 halves the VN pass's
    # channel-term traffic. fp8 messages keep bf16 LLRs — channel values
    # need more mantissa than saturating messages do.
    ldt = (jnp.bfloat16 if jnp.dtype(msgs.dtype).itemsize == 1
           else msgs.dtype)
    llr = llr2d.reshape(C, Z, B).astype(ldt)
    syn = syn2d.reshape(R, Z, B)

    def body(_, m):
        r_c = cn_pass(m, syn, tables, alg, beta, phi_pre, alpha)
        m2, _ = vn_pass(r_c, llr, tables, emit_bits=False, alg=alg,
                        clamp=clamp, phi_pre=phi_pre)
        return m2

    fresh8 = None
    if fresh is not None:
        fresh8 = jnp.broadcast_to(
            (fresh.reshape(-1) != 0).astype(jnp.float32)[None, :], (8, B))
    lo = 0
    if fresh is not None and k > 1:
        r_c = cn_pass(msgs, syn, tables, alg, beta, phi_pre, alpha)
        msgs, _ = vn_pass(r_c, llr, tables, emit_bits=False, alg=alg,
                          clamp=clamp, phi_pre=phi_pre, fresh8=fresh8)
        lo = 1
    msgs = jax.lax.fori_loop(lo, k - 1, body, msgs)
    r_c = cn_pass(msgs, syn, tables, alg, beta, phi_pre, alpha)
    msgs, bits = vn_pass(
        r_c, llr, tables, emit_bits=True, alg=alg, clamp=clamp,
        phi_pre=phi_pre,
        fresh8=fresh8 if (fresh is not None and k == 1) else None)
    violated = parity_pass(bits, syn, tables)
    return (
        msgs.reshape(tables.n_edges, B),
        bits.reshape(tables.n_vars, B),
        violated,
    )


@partial(jax.jit, static_argnames=("b", "alg", "beta", "clamp", "phi_pre",
                                   "alpha"))
def burst_iterations_qc_pallas(msgs2d, llr2d, syn2d, tables: QCPallasTables,
                               b: int, alg: str = "sum-product",
                               beta: float = 0.0, clamp: float = 64.0,
                               phi_pre: float = PRE_THRESHOLD, alpha=1.0):
    """``b`` plain BP iterations, no emit / no parity — bit-identical
    prefix of run_iterations_qc_pallas (see the grouped twin's docstring,
    qc_pallas_grouped.burst_iterations_qc_grouped)."""
    B = msgs2d.shape[-1]
    Z, C, R = tables.Z, tables.C, tables.R
    msgs = msgs2d.reshape(C, tables.d_v, Z, B)
    ldt = (jnp.bfloat16 if jnp.dtype(msgs.dtype).itemsize == 1
           else msgs.dtype)
    llr = llr2d.reshape(C, Z, B).astype(ldt)
    syn = syn2d.reshape(R, Z, B)

    def body(_, m):
        r_c = cn_pass(m, syn, tables, alg, beta, phi_pre, alpha)
        m2, _ = vn_pass(r_c, llr, tables, emit_bits=False, alg=alg,
                        clamp=clamp, phi_pre=phi_pre)
        return m2

    msgs = jax.lax.fori_loop(0, b, body, msgs)
    return msgs.reshape(tables.n_edges, B)


def _shift_of(read_tab, tables: QCPallasTables):
    """Reconstruct absolute rotations from a read table (both modes)."""
    T = tables.tile
    if tables.seam:
        s = read_tab[..., 2] * T + (read_tab[..., 3] - tables.seam)
    else:
        s = read_tab[..., 2] * T + read_tab[..., 3]
    return s % tables.Z


def _parity_kernel(tab_ref, *refs, d_c: int, tile: int, seam: int):
    """check_parity analog (flood.cu:191-223): per grid block, 1 iff any
    check in the block is violated. Windows are staged through an int32
    scratch (non-packed, so the dynamic-start slice is legal)."""
    rps = _refs_per_slot(seam)
    syn_ref = refs[rps * d_c]
    out_ref = refs[rps * d_c + 1]
    scratch = refs[rps * d_c + 2]
    i = pl.program_id(0)
    acc = syn_ref[0].astype(jnp.int32)
    for k in range(d_c):
        if seam:
            main, halo = refs[2 * k], refs[2 * k + 1]
            scratch[k, seam : seam + tile, :] = main[0].astype(jnp.int32)
            pos = jnp.where(tab_ref[i, k, 3] >= seam, seam + tile, 0)
            scratch[k, pl.ds(pos, seam), :] = halo[0].astype(jnp.int32)
        else:
            scratch[k, 0:tile, :] = refs[2 * k][0].astype(jnp.int32)
            scratch[k, tile : 2 * tile, :] = refs[2 * k + 1][0].astype(
                jnp.int32)
        acc = acc + scratch[k, pl.ds(tab_ref[i, k, 3], tile), :]
    viol = acc & 1
    # out block is (1, 1, 8, lb) — Mosaic needs sublane dim >= 8
    out_ref[0, 0] = jnp.broadcast_to(
        jnp.max(viol, axis=0, keepdims=True), out_ref.shape[2:]
    ).astype(jnp.int8)


def parity_pass(bits, syn, tables: QCPallasTables):
    """bits [C, Z, B] int8, syn [R, Z, B] int8 -> [B] bool violated flags.

    Reads only the int8 bits/syndrome arrays (~1/6 of one message pass);
    rotated reads use the same halo/pair specs as the message kernels but
    with a 3-D layout (the source has no slot axis)."""
    T, Z, B = tables.tile, tables.Z, bits.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    rps = _refs_per_slot(tables.seam)
    seam = tables.seam
    n_halo = T // seam if seam else 0
    specs = []
    for k in range(tables.d_c):
        if seam:
            def main_map(i, j, l, tab, _k=k):
                return (tab[i, _k, 0], (tab[i, _k, 2] + j) % NT, l)

            def halo_map(i, j, l, tab, _k=k):
                is_next = tab[i, _k, 3] >= seam
                m = (tab[i, _k, 2] + j
                     + jnp.where(is_next, 1, NT - 1)) % NT
                return (tab[i, _k, 0],
                        m * n_halo + jnp.where(is_next, 0, n_halo - 1), l)

            specs.append(pl.BlockSpec((1, T, lb), main_map,
                                      memory_space=pltpu.VMEM))
            specs.append(pl.BlockSpec((1, seam, lb), halo_map,
                                      memory_space=pltpu.VMEM))
        else:
            for which in (0, 1):
                def index_map(i, j, l, tab, _k=k, _w=which):
                    t0 = tab[i, _k, 2] + j + _w
                    return (tab[i, _k, 0], t0 % NT, l)

                specs.append(pl.BlockSpec((1, T, lb), index_map,
                                          memory_space=pltpu.VMEM))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tables.R, NT, B // lb),
        in_specs=specs + [
            pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, lb),
                               lambda i, j, l, *_: (i, j, 0, l),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM(
                (tables.d_c, _scratch_rows(T, seam), lb), jnp.int32
            )
        ],
    )
    viol = pl.pallas_call(
        partial(_parity_kernel, d_c=tables.d_c, tile=T, seam=seam),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tables.R, NT, 8, B), jnp.int8),
        compiler_params=_compiler_params(3),
        interpret=_interpret(),
    )(tables.cn_read, *([bits] * (rps * tables.d_c)), syn)
    return jnp.any(viol[:, :, 0] > 0, axis=(0, 1))


def syndrome_from_bits_qc_pallas(bits2d, tables: QCPallasTables):
    """[n_checks, B] syndrome from sorted 2-D bits (datagen helper)."""
    B = bits2d.shape[-1]
    bits = bits2d.reshape(tables.C, tables.Z, B)
    col = tables.cn_read[..., 0].reshape(-1)
    s = _shift_of(tables.cn_read, tables).reshape(-1)
    blocks = jnp.take(bits, col, axis=0)
    rolled = jax.vmap(lambda xb, sb: jnp.roll(xb, -sb, axis=0))(blocks, s)
    x = jnp.sum(
        rolled.reshape(tables.R, tables.d_c, tables.Z, -1).astype(jnp.int32),
        axis=1,
    )
    return (x & 1).astype(jnp.int8).reshape(tables.n_checks, B)
