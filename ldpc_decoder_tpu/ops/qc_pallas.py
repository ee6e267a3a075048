"""Fused Pallas TPU kernels for QC-LDPC flood decoding.

The performance core of the framework (the analog of the reference's tuned
CUDA kernels, flood.cu:77-189, but designed for the TPU memory system):

- Messages are stored in *variable order* ``msgs_v [C, d_v, Z, B]`` —
  written aligned by the VN kernel, read rotated by the CN kernel; the
  CN->VN messages ``r_c [R, d_c, Z, B]`` are written aligned by the CN
  kernel and read rotated by the VN kernel. Rotated reads use the
  tile-pair trick: a window starting at arbitrary offset ``j*T + s`` within
  a circulant is covered by two consecutive T-row tiles, fetched through
  the normal Pallas pipeline via scalar-prefetched index maps (so they are
  double-buffered and overlap compute), then cut out with one dynamic-start
  static-size slice in VMEM. No gathers, no scalar DMAs.
- Each kernel fuses rotation + node update + φ into a single pass, so one
  BP iteration touches HBM ~4x the message volume (the XLA path
  materializes ~8 intermediates and pays latency-bound row gathers).

v1 scope: single check degree and single variable degree (regular base
matrices). Irregular bases decode through ops/qc_decode.py (XLA) until the
grouped-kernel variant lands.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ldpc_decoder_tpu.ops.phi import PRE_THRESHOLD, TAYLOR_LIMIT
from ldpc_decoder_tpu.ops.qc_decode import QCDecodeTables


def _phi_abs_f32(x):
    xm = jnp.maximum(x, jnp.float32(PRE_THRESHOLD))
    main = -jnp.log(jnp.tanh(xm * jnp.float32(0.5)))
    return jnp.where(xm > TAYLOR_LIMIT, 2.0 * jnp.exp(-xm), main)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "cn_read",  # [R, d_c, 3] int32: (src col, src slot-free?, ...)
        "vn_read",
        "vn_pos",
        "vn_order",
        "cn_order",
        "erased_mask_sorted",
    ],
    meta_fields=["n_vars", "n_checks", "n_edges", "Z", "C", "R", "d_v",
                 "d_c", "tile"],
)
@dataclasses.dataclass(frozen=True)
class QCPallasTables:
    """Static + prefetch tables for the fused kernels (regular base)."""

    n_vars: int
    n_checks: int
    n_edges: int
    Z: int
    C: int
    R: int
    d_v: int
    d_c: int
    tile: int  # T — rows per pipeline tile; Z % T == 0

    # cn_read[r, k] = (src_col, src_slot, s_tile, s_fine) for reading
    # msgs_v rotated by +s ; [R, d_c, 4] int32
    cn_read: jnp.ndarray
    # vn_read[c, i] = (src_row, src_slot, s_tile, s_fine) for reading
    # r_c rotated by -s ; [C, d_v, 4] int32
    vn_read: jnp.ndarray

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
        if tile is None:
            # VMEM budget: 2*d_c tile-pair input buffers, double-buffered,
            # plus the d-deep output block and the f32 staging scratch
            tile = 512
        while Z % tile:
            tile //= 2
        if tile < 32:
            raise ValueError(f"Z={Z} has no usable tile divisor (>=32)")

        vn_of_cn = np.asarray(t.vn_of_cn)
        cn_of_vn = np.asarray(t.cn_of_vn)
        cn_shift = np.asarray(t.cn_shift).astype(np.int64)
        Zt = Z // tile

        # CN kernel reads msgs_v[(col, slot)] rows [j*T + s ...)
        u = vn_of_cn.reshape(R, d_c)
        s = cn_shift.reshape(R, d_c)
        cn_read = np.stack(
            [u // d_v, u % d_v, (s // tile) % Zt, s % tile], axis=-1
        ).astype(np.int32)

        # VN kernel reads r_c[(row, slot)] rows [j*T - s ...)
        tt = cn_of_vn.reshape(C, d_v)
        s2 = (-cn_shift[cn_of_vn].reshape(C, d_v)) % Z
        vn_read = np.stack(
            [tt // d_c, tt % d_c, (s2 // tile) % Zt, s2 % tile], axis=-1
        ).astype(np.int32)

        return QCPallasTables(
            n_vars=t.n_vars,
            n_checks=t.n_checks,
            n_edges=t.n_edges,
            Z=Z,
            C=C,
            R=R,
            d_v=d_v,
            d_c=d_c,
            tile=tile,
            cn_read=jnp.asarray(cn_read),
            vn_read=jnp.asarray(vn_read),
            vn_pos=t.vn_pos,
            vn_order=t.vn_order,
            cn_order=t.cn_order,
            erased_mask_sorted=t.erased_mask_sorted,
        )


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


LANE_BLOCK = 128  # frames per kernel block; keeps Mosaic's unaligned
# dynamic sublane slicing happy and bounds VMEM for any batch width


def _lane_block(B: int) -> int:
    """128 lanes per block on real batches; small test batches use B."""
    return LANE_BLOCK if B % LANE_BLOCK == 0 else B


def _rot_in_specs(d: int, read_tab_idx: int, tile: int, n_tiles: int,
                  lb: int):
    """2d BlockSpecs reading tile pairs of a [N0, N1, Z, B] array, rotated
    per the prefetch table (arg index ``read_tab_idx`` among the scalar
    prefetch refs). Grid = (nodes, z-tiles, lane-blocks)."""
    specs = []
    for k in range(d):
        for which in (0, 1):
            def index_map(i, j, l, *refs, _k=k, _w=which):
                tab = refs[read_tab_idx]
                t0 = tab[i, _k, 2] + j + _w
                return (tab[i, _k, 0], tab[i, _k, 1], t0 % n_tiles, l)

            specs.append(
                pl.BlockSpec((1, 1, tile, lb), index_map,
                             memory_space=pltpu.VMEM)
            )
    return specs


def _window(refs, k: int, tab_ref, i, tile: int, pair_scratch):
    """Cut the rotated T-row window of slot k out of its tile pair.

    Mosaic has no value-level dynamic_slice; stage the pair through a VMEM
    scratch ref and use dynamic-start ref indexing instead. The scratch is
    always f32: dynamic sublane offsets are not supported for packed dtypes
    (bf16), and the upcast is needed for compute anyway.
    """
    pair_scratch[0:tile] = refs[2 * k][0, 0].astype(jnp.float32)
    pair_scratch[tile : 2 * tile] = refs[2 * k + 1][0, 0].astype(jnp.float32)
    s_fine = tab_ref[i, k, 3]
    return pair_scratch[pl.ds(s_fine, tile), :]


def _cn_kernel(tab_ref, *refs, d_c: int, tile: int):
    """Check-node update (flood_backward) with rotated reads.

    refs = 2*d_c message tile-pairs, syndrome tile, output [1, d_c, T, B],
    scratch pair [2T, B].
    """
    syn_ref = refs[2 * d_c]
    out_ref = refs[2 * d_c + 1]
    pair_scratch = refs[2 * d_c + 2]
    i = pl.program_id(0)
    m = [
        _window(refs, k, tab_ref, i, tile, pair_scratch)
        for k in range(d_c)
    ]
    a = [jnp.abs(x) for x in m]
    ext = a[0]
    for x in a[1:]:
        ext = ext + x
    votes = syn_ref[0].astype(jnp.int32)
    for x in m:
        votes = votes + (1 - jnp.signbit(x).astype(jnp.int32))
    parity = votes & 1
    for k in range(d_c):
        res = _phi_abs_f32(ext - a[k])
        is_neg = (jnp.signbit(m[k]).astype(jnp.int32) ^ parity) == 1
        out_ref[0, k] = jnp.where(is_neg, -res, res).astype(out_ref.dtype)


def _vn_kernel(tab_ref, *refs, d_v: int, tile: int):
    """Variable-node update (flood_forward) with rotated reads.

    refs = 2*d_v r_c tile-pairs, llr tile, then out refs
    (msgs_v [1, d_v, T, B], totals [1, T, B]).
    """
    llr_ref = refs[2 * d_v]
    out_msgs = refs[2 * d_v + 1]
    out_totals = refs[2 * d_v + 2]
    pair_scratch = refs[2 * d_v + 3]
    i = pl.program_id(0)
    r = [
        _window(refs, k, tab_ref, i, tile, pair_scratch)
        for k in range(d_v)
    ]
    total = llr_ref[0].astype(jnp.float32)
    for x in r:
        total = total + x
    out_totals[0] = total
    for k in range(d_v):
        pre = total - r[k]
        out_msgs[0, k] = jnp.copysign(
            _phi_abs_f32(jnp.abs(pre)), pre
        ).astype(out_msgs.dtype)


def cn_pass(msgs_v, syn3, tables: QCPallasTables):
    """msgs_v [C, d_v, Z, B], syn3 [R, Z, B] -> r_c [R, d_c, Z, B]."""
    T, Z, B = tables.tile, tables.Z, msgs_v.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tables.R, NT, B // lb),
        in_specs=_rot_in_specs(tables.d_c, 0, T, NT, lb)
        + [
            pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tables.d_c, T, lb),
            lambda i, j, l, *_: (i, 0, j, l),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((2 * T, lb), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_cn_kernel, d_c=tables.d_c, tile=T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (tables.R, tables.d_c, Z, B), msgs_v.dtype
        ),
        interpret=_interpret(),
    )(tables.cn_read, *([msgs_v] * (2 * tables.d_c)), syn3)


def vn_pass(r_c, llr3, tables: QCPallasTables):
    """r_c [R, d_c, Z, B], llr3 [C, Z, B] -> (msgs_v [C, d_v, Z, B],
    totals [C, Z, B] f32)."""
    T, Z, B = tables.tile, tables.Z, r_c.shape[-1]
    NT = Z // T
    lb = _lane_block(B)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(tables.C, NT, B // lb),
        in_specs=_rot_in_specs(tables.d_v, 0, T, NT, lb)
        + [
            pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(
                (1, tables.d_v, T, lb),
                lambda i, j, l, *_: (i, 0, j, l),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, T, lb), lambda i, j, l, *_: (i, j, l),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((2 * T, lb), jnp.float32)],
    )
    return pl.pallas_call(
        partial(_vn_kernel, d_v=tables.d_v, tile=T),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((tables.C, tables.d_v, Z, B), r_c.dtype),
            jax.ShapeDtypeStruct((tables.C, Z, B), jnp.float32),
        ],
        interpret=_interpret(),
    )(tables.vn_read, *([r_c] * (2 * tables.d_v)), llr3)


def init_messages_qc_pallas(llr2d, tables: QCPallasTables,
                            dtype=jnp.float32):
    """VN-layout init: every slot of a variable gets φ(llr) — aligned, no
    rotation needed (unlike CN-layout init)."""
    B = llr2d.shape[-1]
    llr = llr2d.reshape(tables.C, tables.Z, B).astype(jnp.float32)
    p = jnp.copysign(_phi_abs_f32(jnp.abs(llr)), llr).astype(dtype)
    m = jnp.broadcast_to(
        p[:, None], (tables.C, tables.d_v, tables.Z, B)
    )
    return m.reshape(tables.n_edges, B)


@partial(jax.jit, static_argnames=("k",))
def run_iterations_qc_pallas(msgs2d, llr2d, syn2d, tables: QCPallasTables,
                             k: int):
    """2-D-interface twin of ops.decode.run_iterations (msgs in VN layout)."""
    B = msgs2d.shape[-1]
    Z, C, R = tables.Z, tables.C, tables.R
    msgs = msgs2d.reshape(C, tables.d_v, Z, B)
    llr = llr2d.reshape(C, Z, B)
    syn = syn2d.reshape(R, Z, B)

    def body(_, carry):
        m, _ = carry
        r_c = cn_pass(m, syn, tables)
        return vn_pass(r_c, llr, tables)

    totals0 = jnp.zeros((C, Z, B), jnp.float32)
    msgs, totals = jax.lax.fori_loop(0, k, body, (msgs, totals0))
    bits = (~jnp.signbit(totals)).astype(jnp.int8)
    violated = _parity(bits, syn, tables)
    return (
        msgs.reshape(tables.n_edges, B),
        bits.reshape(tables.n_vars, B),
        violated,
    )


def _parity(bits, syn, tables: QCPallasTables):
    """Parity flags via rotated reads of the (cheap, int8) bits array —
    reuses the XLA roll path; runs once per k iterations."""
    # bits [C, Z, B] -> per cn block: roll(bits[col], -s)
    col = tables.cn_read[..., 0].reshape(-1)  # [R*d_c]
    # reconstruct shift = s_tile*T + s_fine
    s = (
        tables.cn_read[..., 2].reshape(-1) * tables.tile
        + tables.cn_read[..., 3].reshape(-1)
    )
    blocks = jnp.take(bits, col, axis=0)
    rolled = jax.vmap(lambda xb, sb: jnp.roll(xb, -sb, axis=0))(blocks, s)
    x = jnp.sum(
        rolled.reshape(tables.R, tables.d_c, tables.Z, -1).astype(jnp.int32),
        axis=1,
    )
    viol = ((x + syn.astype(jnp.int32)) & 1) > 0
    return jnp.any(viol, axis=(0, 1))


def syndrome_from_bits_qc_pallas(bits2d, tables: QCPallasTables):
    """[n_checks, B] syndrome from sorted 2-D bits (datagen helper)."""
    B = bits2d.shape[-1]
    bits = bits2d.reshape(tables.C, tables.Z, B)
    col = tables.cn_read[..., 0].reshape(-1)
    s = (
        tables.cn_read[..., 2].reshape(-1) * tables.tile
        + tables.cn_read[..., 3].reshape(-1)
    )
    blocks = jnp.take(bits, col, axis=0)
    rolled = jax.vmap(lambda xb, sb: jnp.roll(xb, -sb, axis=0))(blocks, s)
    x = jnp.sum(
        rolled.reshape(tables.R, tables.d_c, tables.Z, -1).astype(jnp.int32),
        axis=1,
    )
    return (x & 1).astype(jnp.int8).reshape(tables.n_checks, B)
