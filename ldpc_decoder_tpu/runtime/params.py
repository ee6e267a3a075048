"""Decoder parameter structs.

Mirror of the reference's static/dynamic parameter split
(h/ldpc_decoder_gpu_common.h:7-54), adapted to TPU: thread-geometry knobs
disappear (XLA owns scheduling), replaced by dtype/mesh choices.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class StaticParams:
    """Fixed at decoder construction (h/ldpc_decoder_gpu_common.h:7-22)."""

    # log2 of the max number of frames resident on the device, user cap;
    # the actual value may be lowered by the memory model (default 5,
    # h/ldpc_decoder_gpu_common.h:19)
    max_log_parallel_factor_user: int = 5
    # message storage dtype: "float32", "bfloat16" (the TPU analog of the
    # reference's CUDA fp16 build option, CMakeLists.txt:13-15), or
    # "float8_e5m2" (experimental: halves message traffic again; φ is
    # clamped at the reference's infinity threshold 10 so messages stay
    # normal fp8 values). NB float8_e5m2 is numerically correct but
    # measured NET SLOWER than bfloat16 on v5e (no native fp8 VPU — the
    # conversions cost more than the saved bandwidth; ROADMAP dead-end
    # table): a construction-time warning flags the trap.
    message_dtype: str = "float32"
    # fraction of device memory kept free (reference reserves 10%,
    # ldpc_decoder_gpu.cu:84-88)
    memory_headroom: float = 0.10
    # override detected per-device HBM bytes (None = autodetect)
    device_memory_bytes: int | None = None
    # kernel implementation for QC codes: "auto" (fused Pallas kernels when
    # the base matrix is regular, else XLA), "pallas", or "xla"
    kernel_impl: str = "auto"
    # check-node rule: "sum-product" (exact tanh rule in the φ domain,
    # matching the reference, flood.cu:88-114) or "min-sum" (offset
    # two-minimum approximation; no transcendentals, higher throughput,
    # ~0.05-0.1 dB threshold loss; QC paths only)
    algorithm: str = "sum-product"
    # offset β of offset-min-sum (|out| = max(min - β, 0))
    minsum_offset: float = 0.5
    # symmetric LLR clamp applied to min-sum variable messages
    minsum_clamp: float = 64.0

    def __post_init__(self):
        valid = ("float32", "bfloat16", "float8_e5m2")
        if self.message_dtype not in valid:
            raise ValueError(
                f"message_dtype must be one of {valid}, "
                f"got {self.message_dtype!r}")
        if self.message_dtype == "float8_e5m2":
            import warnings

            warnings.warn(
                "message_dtype='float8_e5m2' is a measured NEGATIVE "
                "result on TPU v5e: numerically correct but net slower "
                "than 'bfloat16' (no native fp8 VPU; ROADMAP.md dead-end "
                "table). Use 'bfloat16' unless re-measuring.",
                stacklevel=2,
            )


@dataclass
class DynamicParams:
    """Per-decode knobs (h/ldpc_decoder_gpu_common.h:24-54)."""

    # runtime LLR-magnitude cap t: messages are clamped to |m| <= t via a
    # φ-input floor of φ(t) ≈ 2e^{-t}, exactly the reference OpenCL
    # backend's derivation (flood_vec2.cl:187, ldpc_decoder_gpu_common.h:
    # 27-30). None = backend default 1e-5 (cap ≈ 12.2) — the reference
    # CUDA backend's own hard-coded choice (flood.cu:14).
    infinity_threshold: float | None = None
    num_iter_max: int = 100
    # iterations between on-device parity checks / refills
    num_iter_check_parity: int = 10
    # iteration of the FIRST parity check (0 = num_iter_check_parity, i.e.
    # the reference's fixed-period behavior). Setting it higher runs the
    # first (first_check - k) iterations as a plain kernel burst with no
    # hard-decision emit, parity kernel, or retire/refill machinery —
    # profitable when no frame can converge that early (e.g. the flagship
    # p41 point at sigma 0.94: true first convergence >= ~60 iterations
    # measured over 2048+ frames, so 56 skips three provably-futile
    # checks). Applies to the initial generation only; refilled lanes are
    # checked every k as usual. A frame that would converge during the
    # burst is still decoded correctly — it just retires at the first
    # post-burst check, so a too-large value costs throughput, never
    # correctness.
    num_iter_first_check: int = 0
    # frames per run = parallel_factor * loading_factor (main.cpp:320)
    loading_factor: int = 4
    target_errors: int = 0
    num_vectors_per_run: int = 0  # filled by the harness
