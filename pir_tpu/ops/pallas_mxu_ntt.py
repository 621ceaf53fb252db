"""Fused Pallas TPU kernel: four-step NTT/INTT on the MXU, one HBM pass.

The XLA four-step formulation (ops/mxu_ntt.py) is algebraically right for
the TPU — the transform's FLOPs ride the systolic array — but XLA
materializes every digit-product tensor to HBM, and at 25 products per
matmul step the traffic swamps the MXU win.  This kernel fuses the whole
transform per polynomial block: digit extraction, both digit-matmul
steps, the twiddle plane, and the modular recombination all run over
VMEM-resident tiles, so HBM is touched exactly twice (read the
coefficients, write the transform).

Math and digit scheme are identical to ops/mxu_ntt.py (same
build_matrices constants, balanced base-256 digits, f32-exact MXU
accumulation) with an asymmetric split n2 = 128 so every matrix op keeps
full 128-lane tiles:

  forward:  out = ((M1 @ A) . T) @ W2       A = x.reshape(n1, n2)
  inverse:  out = M1i @ ((Y @ W2i) . Ti)

A block of bB polynomials is processed per grid step; the step-1
contraction over i1 is batched MXU-natively by collapsing (poly, i1)
rows against a block-diagonal bB*n1 x bB*n1 left matrix (bB copies of M1
on the diagonal) — bB x redundant MACs on an otherwise idle MXU buy full
128-row utilization.  All 64-bit modular arithmetic inside the kernel is
u32 lane pairs (ops/wide32.py; Mosaic has no u64).

Bit-exact with NttTables.forward/inverse (tests/test_pallas_mxu_ntt.py).
Semantics: seal transform_to/from_ntt_inplace, reference call sites
pir/cpp/database.cpp:74,104,250-254.
"""

from __future__ import annotations


import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pir_tpu.ops import mxu_ntt, modular, wide32

LANES = 128
# Polynomials per grid step.  The block-diagonal step-1 batching (bB
# copies of M1 on the diagonal) buys full 128-row tiles at the cost of
# bB-fold redundant MACs; measured on v5e (round 5, fenced sweeps over
# every production shape: sv [324,2,4096], key-switch digits/INTT
# [128,3,4096], level-0 digits [648,2,4096]) the redundancy now costs
# 1.4-2.5x more than the tall tiles save, so one polynomial per step —
# [n1, n1] x [n1, n2] left dots on a quarter-height tile — is fastest.
DEFAULT_BLOCK_B = 1


def supported(n: int) -> bool:
    """Needs the n2=128 full-lane split: N = n1 * 128 with n1 >= 8."""
    if n & (n - 1):
        return False
    return n >= 8 * LANES and n // LANES <= LANES


def _split_words(x64: np.ndarray):
    hi = (x64 >> np.uint64(32)).astype(np.uint32)
    lo = (x64 & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return hi, lo


class _KernelPlan:
    """Host-precomputed operands + per-limb scalar constants."""

    def __init__(self, tables, inverse: bool, block_b: int):
        n = tables.n
        self.n = n
        self.inverse = inverse
        self.block_b = block_b
        n1 = n // LANES
        n2 = LANES
        self.n1, self.n2 = n1, n2
        moduli = tables.moduli
        self.moduli = moduli
        L = len(moduli)
        max_bits = max(m.bit_length() for m in moduli)
        self.ndig = ndig = mxu_ntt._balanced_digit_count(max_bits)
        if ndig * n2 * (1 << 14) > (1 << 24):
            raise ValueError("digit-matmul exactness bound exceeded")

        m_left, tw, m_right = mxu_ntt.build_matrices(tables, inverse, n1, n2)
        left_dig = mxu_ntt._host_digits(m_left, ndig)  # i8 [L, D, n1, n1]
        right_dig = mxu_ntt._host_digits(m_right, ndig)  # i8 [L, D, n2, n2]
        bf16 = jnp.bfloat16
        # block-diagonal batched left matrix: bB copies of M1 [L,D,bB*n1,bB*n1]
        bb = block_b
        big = np.zeros((L, ndig, bb * n1, bb * n1), dtype=np.int8)
        for b in range(bb):
            big[:, :, b * n1 : (b + 1) * n1, b * n1 : (b + 1) * n1] = left_dig
        self.left_big = np.asarray(big, dtype=bf16)
        self.right = np.asarray(right_dig, dtype=bf16)
        # twiddle plane tiled over the poly block: [L, bB*n1, n2]
        tw_tiled = np.tile(tw, (1, bb, 1))
        tw_shoup = np.asarray(
            (tw_tiled.astype(object) * (1 << 64)) // np.array(
                [[[q]] for q in moduli], dtype=object
            ),
            dtype=np.uint64,
        )
        self.tw_h, self.tw_l = _split_words(tw_tiled)
        self.ts_h, self.ts_l = _split_words(tw_shoup)

        # Per-limb scalar words, packed as one u32[L, 4 + 6*n_groups] SMEM
        # table operand: [q_h, q_l, r_h, r_l] then per bucket group
        # [kg_h, kg_l, sc_h, sc_l, ss_h, ss_l].  A table operand (instead
        # of baked Python constants) keeps the kernel program identical
        # across devices of a limb-sharded mesh, where each device owns
        # different moduli (same trick as pallas_scan.limb_consts).
        bias = sum(128 << (8 * i) for i in range(ndig))
        self.bias_h = np.uint32(bias >> 32)
        self.bias_l = np.uint32(bias & 0xFFFFFFFF)
        n_buckets = 2 * ndig - 1
        self.n_groups = -(-n_buckets // 5)
        rows = []
        for q in moduli:
            rhi = modular.barrett_ratio(q)[0]
            row = [q >> 32, q & 0xFFFFFFFF, rhi >> 32, rhi & 0xFFFFFFFF]
            for g in range(self.n_groups):
                lo_s = 5 * g
                hi_s = min(lo_s + 5, n_buckets)
                kg = sum((1 << 24) << (8 * s) for s in range(hi_s - lo_s))
                kg_mod = kg % q
                scale = pow(2, 40 * g, q)
                scale_shoup = (scale << 64) // q
                row += [
                    kg_mod >> 32, kg_mod & 0xFFFFFFFF,
                    scale >> 32, scale & 0xFFFFFFFF,
                    scale_shoup >> 32, scale_shoup & 0xFFFFFFFF,
                ]
            rows.append(row)
        self.consts = np.array(rows, dtype=np.uint32)
        # jitted entry cache, keyed by interpret flag — kept on the plan
        # (GC'd with the tables) instead of the process-global jit cache
        self._jit: dict = {}


def _plan(tables, inverse: bool, block_b: int) -> _KernelPlan:
    attr = f"_pallas_mxu_{'inv' if inverse else 'fwd'}_{block_b}"
    plan = getattr(tables, attr, None)
    if plan is None:
        plan = _KernelPlan(tables, inverse, block_b)
        setattr(tables, attr, plan)
    return plan


def _digits(plan, yh, yl, dtype):
    """Balanced base-256 digits of the biased pair, as matmul-dtype planes."""
    yh, yl = wide32.add64(yh, yl, plan.bias_h, plan.bias_l)
    planes = []
    for d in range(plan.ndig):
        if 8 * d < 32:
            byte = (yl >> np.uint32(8 * d)) & np.uint32(0xFF)
        else:
            byte = (yh >> np.uint32(8 * d - 32)) & np.uint32(0xFF)
        planes.append(
            (byte.astype(jnp.int32) - jnp.int32(128)).astype(dtype)
        )
    return planes


def _recombine(plan, lc, buckets):
    """f32 diagonal buckets -> u32 pair mod q (per-limb consts lc)."""
    qh, ql = lc["q_h"], lc["q_l"]
    out_h = out_l = None
    n_buckets = 2 * plan.ndig - 1
    for g, gc in enumerate(lc["groups"]):
        lo_s = 5 * g
        hi_s = min(lo_s + 5, n_buckets)
        acc_h = acc_l = None
        for s in range(lo_s, hi_s):
            # lift each signed bucket by +2^24 (corrected via kg below)
            b = buckets[s].astype(jnp.int32) + jnp.int32(1 << 24)
            bu = b.astype(jnp.uint32)  # value in [0, 2^25)
            sh = 8 * (s - lo_s)
            if sh == 0:
                th, tl = jnp.zeros_like(bu), bu
            elif sh < 32:
                th, tl = bu >> np.uint32(32 - sh), bu << np.uint32(sh)
            else:
                th, tl = bu << np.uint32(sh - 32), jnp.zeros_like(bu)
            if acc_h is None:
                acc_h, acc_l = th, tl
            else:
                acc_h, acc_l = wide32.add64(acc_h, acc_l, th, tl)
        # total < 5 * 2^(25+32) < 2^60 — one Barrett, then drop the lift
        rh, rl = wide32.barrett_reduce64(
            acc_h, acc_l, lc["r_h"], lc["r_l"], qh, ql
        )
        rh, rl = wide32.submod64(rh, rl, gc["kg_h"], gc["kg_l"], qh, ql)
        if g > 0:
            rh, rl = wide32.shoup_mulmod(
                rh, rl, gc["sc_h"], gc["sc_l"], gc["ss_h"], gc["ss_l"], qh, ql
            )
        if out_h is None:
            out_h, out_l = rh, rl
        else:
            out_h, out_l = wide32.addmod64(out_h, out_l, rh, rl, qh, ql)
    return out_h, out_l


def _dot_step(plan, digits, mat, left: bool):
    """One digit-matmul step -> f32 buckets.

    left: mat [D, M, M] multiplies from the left (contract rows of the
    data); otherwise mat [D, K, K] multiplies from the right (contract
    the lane axis)."""
    buckets = [None] * (2 * plan.ndig - 1)
    for d in range(plan.ndig):
        for e in range(plan.ndig):
            if left:
                p = jnp.dot(
                    mat[d], digits[e], preferred_element_type=jnp.float32
                )
            else:
                p = jnp.dot(
                    digits[d], mat[e], preferred_element_type=jnp.float32
                )
            s = d + e
            buckets[s] = p if buckets[s] is None else buckets[s] + p
    return buckets


def _limb_scalars(plan, consts_ref, li):
    """Per-limb scalar words for limb li, read from the SMEM table."""
    lc = {
        "q_h": consts_ref[li, 0],
        "q_l": consts_ref[li, 1],
        "r_h": consts_ref[li, 2],
        "r_l": consts_ref[li, 3],
        "groups": [],
    }
    for g in range(plan.n_groups):
        o = 4 + 6 * g
        lc["groups"].append(
            {
                "kg_h": consts_ref[li, o],
                "kg_l": consts_ref[li, o + 1],
                "sc_h": consts_ref[li, o + 2],
                "sc_l": consts_ref[li, o + 3],
                "ss_h": consts_ref[li, o + 4],
                "ss_l": consts_ref[li, o + 5],
            }
        )
    return lc


def _make_kernel(plan, dtype, n_limbs):
    bb, n1, n2 = plan.block_b, plan.n1, plan.n2
    rows = bb * n1

    def kernel(consts_ref, lbig_ref, right_ref, twh_ref, twl_ref, tsh_ref,
               tsl_ref, xh_ref, xl_ref, oh_ref, ol_ref):
        for li in range(n_limbs):
            lc = _limb_scalars(plan, consts_ref, li)
            qh, ql = lc["q_h"], lc["q_l"]
            xh = xh_ref[:, li].reshape(rows, n2)  # [(b n1), n2]
            xl = xl_ref[:, li].reshape(rows, n2)
            lbig = lbig_ref[li]  # [D, rows, rows]
            right = right_ref[li]  # [D, n2, n2]
            twh = twh_ref[li]
            twl = twl_ref[li]
            tsh = tsh_ref[li]
            tsl = tsl_ref[li]

            def left_step(h, l):
                return _recombine(
                    plan, lc,
                    _dot_step(plan, _digits(plan, h, l, dtype), lbig, True),
                )

            def right_step(h, l):
                return _recombine(
                    plan, lc,
                    _dot_step(plan, _digits(plan, h, l, dtype), right, False),
                )

            if plan.inverse:
                ch, cl = right_step(xh, xl)
            else:
                ch, cl = left_step(xh, xl)
            gh, gl = wide32.shoup_mulmod(ch, cl, twh, twl, tsh, tsl, qh, ql)
            if plan.inverse:
                oh, ol = left_step(gh, gl)
            else:
                oh, ol = right_step(gh, gl)
            oh_ref[:, li] = oh.reshape(bb, n1, n2)
            ol_ref[:, li] = ol.reshape(bb, n1, n2)

    return kernel


def _ntt_flat_fn(plan, interpret: bool):
    """The jitted flat-batch transform for one plan, cached on the plan
    (so its lifetime tracks the tables object, not the global jit cache).

    All per-limb operand arrays — including the scalar-words table — are
    jit *arguments*: with host constants this compiles the classic
    single-chip kernel; under shard_map limb sharding the same program
    consumes each device's traced slices (see :func:`ntt_sharded`)."""
    fn = plan._jit.get(interpret)
    if fn is not None:
        return fn

    def run(x, consts, lbig, right, twh, twl, tsh, tsl):
        B, L, n = x.shape
        n1, n2 = plan.n1, plan.n2
        bb = plan.block_b
        pad = (-B) % bb
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad, L, n), jnp.uint64)], axis=0
            )
        xh, xl = wide32.split_u64(x)
        xh = xh.reshape(-1, L, n1, n2)
        xl = xl.reshape(-1, L, n1, n2)
        grid = ((B + pad) // bb,)
        zero = np.int32(0)
        # interpret mode runs the dots on XLA-CPU, whose dot thunk lacks
        # the bf16 x bf16 -> f32 mode; f32 operands are equally exact here
        dtype = jnp.float32 if interpret else jnp.bfloat16
        lbig = lbig.astype(dtype)
        right = right.astype(dtype)

        def const_spec(arr):
            return pl.BlockSpec(
                arr.shape, lambda b: (zero,) * arr.ndim,
                memory_space=pltpu.VMEM,
            )

        consts_spec = pl.BlockSpec(
            consts.shape, lambda b: (zero, zero), memory_space=pltpu.SMEM
        )
        x_spec = pl.BlockSpec(
            (bb, L, n1, n2), lambda b: (b, zero, zero, zero),
            memory_space=pltpu.VMEM,
        )
        oh, ol = pl.pallas_call(
            _make_kernel(plan, dtype, L),
            grid=grid,
            in_specs=[
                consts_spec,
                const_spec(lbig), const_spec(right),
                const_spec(twh), const_spec(twl),
                const_spec(tsh), const_spec(tsl),
                x_spec, x_spec,
            ],
            out_specs=(x_spec, x_spec),
            out_shape=(
                jax.ShapeDtypeStruct(xh.shape, jnp.uint32),
                jax.ShapeDtypeStruct(xh.shape, jnp.uint32),
            ),
            interpret=interpret,
        )(consts, lbig, right, twh, twl, tsh, tsl, xh, xl)
        out = wide32.join_u64(oh, ol).reshape(-1, L, n)
        return out[:B] if pad else out

    fn = jax.jit(run)
    plan._jit[interpret] = fn
    return fn


def ntt(tables, x, inverse: bool, interpret: bool = False,
        block_b: int = DEFAULT_BLOCK_B):
    """NTT/INTT of u64[..., L, N] — drop-in for NttTables.forward/inverse."""
    n = tables.n
    L = len(tables.moduli)
    batch = x.shape[:-2]
    flat = x.reshape((-1, L, n))
    if flat.shape[0] == 0:
        return x
    if flat.shape[0] < block_b:
        block_b = max(1, int(flat.shape[0]))
    plan = _plan(tables, inverse, block_b)
    out = _ntt_flat_fn(plan, interpret)(
        flat,
        jnp.asarray(plan.consts),
        jnp.asarray(plan.left_big), jnp.asarray(plan.right),
        jnp.asarray(plan.tw_h), jnp.asarray(plan.tw_l),
        jnp.asarray(plan.ts_h), jnp.asarray(plan.ts_l),
    )
    return out.reshape(*batch, L, n)


# ----------------------------------------------------------------------
# Limb-sharded entry (parallel/sharded.py)
# ----------------------------------------------------------------------

def plan_arrays(tables, inverse: bool) -> dict:
    """The per-limb operand arrays of the global plan, L-leading — host
    numpy, ready to be sharded over a mesh "limb" axis (axis 0 of every
    array).  Keys match :func:`ntt_sharded`'s expectations."""
    plan = _plan(tables, inverse, DEFAULT_BLOCK_B)
    return {
        "consts": plan.consts,
        "lbig": plan.left_big,
        "right": plan.right,
        "twh": plan.tw_h,
        "twl": plan.tw_l,
        "tsh": plan.ts_h,
        "tsl": plan.ts_l,
    }


def ntt_sharded(tables, arrs: dict, x, inverse: bool, interpret: bool = False):
    """NTT/INTT inside a limb-sharded shard_map region.

    ``tables`` is the GLOBAL (limb-dense, concrete-moduli) NttTables — it
    supplies only the static structure (N split, digit count, bucket
    grouping; identical for every limb of one chain).  ``arrs`` carries
    this device's traced slices of :func:`plan_arrays` for the matching
    direction; ``x`` is u64[..., L_local, N].  Bit-exact with the
    single-chip kernel on the device's own limbs."""
    n = tables.n
    batch = x.shape[:-2]
    l_local = x.shape[-2]
    flat = x.reshape((-1, l_local, n))
    if flat.shape[0] == 0:
        return x
    plan = _plan(tables, inverse, DEFAULT_BLOCK_B)
    out = _ntt_flat_fn(plan, interpret)(
        flat,
        arrs["consts"], arrs["lbig"], arrs["right"],
        arrs["twh"], arrs["twl"], arrs["tsh"], arrs["tsl"],
    )
    return out.reshape(*batch, l_local, n)
