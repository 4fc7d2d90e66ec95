"""Banded-SpMV formulation shoot-out at the finest-sweep operator shape.

The large-mesh CG step spends ~85% of its time in banded matvecs
(2 PCG solves x (6,5) iterations + ~5 RHS applies, solver/ipcs.py
ipcs_step_cg_banded).  Round 3 measured the production XLA windowed form
at ~2.3 ms/matvec for a ~107 MB operator — 53 GB/s, ~15x off the v5e HBM
roofline — and the round-3 Pallas kernel at 6.75 ms (cross-lane
reductions + no DMA/compute overlap).  This script races candidate
formulations on a synthetic operator with the EXACT finest-row shape
(n=29,768 velocity dofs, half-bandwidth ~408 after RCM, ~50 nnz/row —
docs/CG_SCAN_CRASH.md) so the winner can be promoted to the production
layout (ops/banded.py).

Candidates:
  xla_win_R8    current production: R=8 row-blocks, windowed concat form
  xla_win_R128  same algebra, R=128/g=128 layout (X_win shrinks 16x)
  xla_qsum_R128 no concat: q-partitioned multiply+lane-reduce, R=128
  xla_bdot_R128 batched dot_general (B,128,W)@(B,W,1) -> MXU
  pl_mxu_R128   Pallas: x pinned in VMEM as (L/128,128), blocks streamed,
                window = 8-sublane-row slice, MXU dot per block
  pl_vpu_R128   Pallas: q-loop with natural lane broadcast + one final
                cross-lane reduce per block
  *_bf16        winner re-run with bfloat16 blocks, f32 accumulation

Usage:
  JAX_PLATFORMS=cpu python scripts/banded_formulation_bench.py --check-only
  python scripts/banded_formulation_bench.py [--n 29768] [--hb 408]
      [--no-pause]
"""
from __future__ import annotations

import argparse
import contextlib
import functools
import os
import signal
import sys
import time

import numpy as np


@contextlib.contextmanager
def deadline(seconds: int):
    """SIGALRM guard: the remote compile service sometimes hangs a request
    indefinitely (docs/AXON.md); convert that into a TimeoutError so one
    wedged candidate doesn't stall the whole shoot-out."""

    def _raise(signum, frame):
        raise TimeoutError(f"deadline {seconds}s")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_synthetic(n: int, hb: int, nnz_per_row: int, seed: int = 0):
    """Random banded matrix: ~nnz_per_row entries/row inside |i-j|<=hb,
    diagonal present (FEM-like after RCM)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    rows = np.repeat(np.arange(n), nnz_per_row)
    offs = rng.integers(-hb, hb + 1, size=rows.size)
    cols = np.clip(rows + offs, 0, n - 1)
    vals = rng.standard_normal(rows.size) * 0.1
    diag_r = np.arange(n)
    rows = np.concatenate([rows, diag_r])
    cols = np.concatenate([cols, diag_r])
    vals = np.concatenate([vals, np.full(n, 4.0)])
    A = sp.coo_matrix((vals, (rows, cols)), shape=(n, n)).tocsr()
    A.sum_duplicates()
    return A


def build_R128(A, dtype, jnp):
    """(B,128,W) layout with g=128: window of block b = xpad[128*b : 128*b+W],
    xpad[i] = x[i-pad]."""
    coo = A.tocoo()
    n = A.shape[0]
    row = coo.row.astype(np.int64)
    col = coo.col.astype(np.int64)
    g = 128
    B = -(-n // g)
    b = row // g
    pad = int(max(0, (b * g - col).max()))
    j = col - b * g + pad
    W = (-(-(int(j.max()) + 1) // 128)) * 128
    L = (B + W // g - 1) * g
    while L < n + pad:
        W += 128
        L = (B + W // g - 1) * g
    flat = row * W + j
    blocks = (
        jnp.zeros(B * g * W, dtype=dtype)
        .at[jnp.asarray(flat)]
        .set(jnp.asarray(coo.data, dtype=dtype))
        .reshape(B, g, W)
    )
    return blocks, pad, W, L


# --------------------------------------------------------------------------
# XLA formulations (R=128 layout)
# --------------------------------------------------------------------------


def make_xla_win_R128(blocks, pad, L, n, jax, jnp):
    B, R, W = blocks.shape
    m = W // 128

    @jax.jit
    def mv(x):
        xpad = jnp.zeros((L,), jnp.float32).at[pad : pad + n].set(x)
        Z = xpad.reshape(L // 128, 128)
        X_win = jnp.concatenate([Z[q : q + B] for q in range(m)], axis=1)
        y = jnp.sum(blocks * X_win[:, None, :].astype(blocks.dtype),
                    axis=2, dtype=jnp.float32)
        return y.reshape(B * R)[:n]

    return mv


def make_xla_qsum_R128(blocks, pad, L, n, jax, jnp):
    B, R, W = blocks.shape
    m = W // 128

    @jax.jit
    def mv(x):
        xpad = jnp.zeros((L,), jnp.float32).at[pad : pad + n].set(x)
        Z = xpad.reshape(L // 128, 128).astype(blocks.dtype)
        y = jnp.zeros((B, R), jnp.float32)
        for q in range(m):
            y = y + jnp.sum(
                blocks[:, :, q * 128 : (q + 1) * 128] * Z[q : q + B][:, None, :],
                axis=2, dtype=jnp.float32,
            )
        return y.reshape(B * R)[:n]

    return mv


def make_xla_bdot_R128(blocks, pad, L, n, jax, jnp):
    B, R, W = blocks.shape
    m = W // 128

    @jax.jit
    def mv(x):
        xpad = jnp.zeros((L,), jnp.float32).at[pad : pad + n].set(x)
        Z = xpad.reshape(L // 128, 128)
        X_win = jnp.concatenate([Z[q : q + B] for q in range(m)], axis=1)
        y = jax.lax.dot_general(
            blocks, X_win.astype(blocks.dtype)[:, :, None],
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        return y.reshape(B * R)[:n]

    return mv


# --------------------------------------------------------------------------
# Pallas formulations (R=128 layout; x pinned as (L/128, 128) in VMEM)
# --------------------------------------------------------------------------


def _pl():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    return pl, pltpu


def make_pl_kernel(blocks, pad, L, n, jax, jnp, mode: str, sb: int = 8,
                   interpret: bool = False):
    pl, pltpu = _pl()
    B, R, W = blocks.shape
    Wr = W // 128
    # The (nb*sb, R) output block is (sb, R): Mosaic requires the last two
    # block dims divisible by (8, 128), so sb must be a multiple of 8.
    assert sb % 8 == 0, "sb must be a multiple of 8 (output sublane tiling)"
    nb = pl.cdiv(B, sb)
    padb = nb * sb - B
    if padb:
        blocks = jnp.pad(blocks, ((0, padb), (0, 0), (0, 0)))
    Lr = L // 128 + (padb if padb else 0)

    def kernel(x_ref, b_ref, o_ref):
        i = pl.program_id(0)
        for j in range(sb):
            xw = x_ref[pl.ds((i * sb + j), Wr)]  # (Wr, 128) window rows
            blk = b_ref[j]  # (R, W)
            if mode == "mxu":
                xcol = xw.reshape(W, 1).astype(blk.dtype)
                o_ref[j] = jnp.dot(
                    blk, xcol, preferred_element_type=jnp.float32
                )[:, 0]
            else:  # vpu
                acc = jnp.zeros((R, 128), jnp.float32)
                for q in range(Wr):
                    acc += (
                        blk[:, q * 128 : (q + 1) * 128]
                        * xw[q][None, :].astype(blk.dtype)
                    ).astype(jnp.float32)
                o_ref[j] = jnp.sum(acc, axis=1)

    def zmap(i):
        return (jnp.int32(0), jnp.int32(0))

    def bmap(i):
        return (jnp.asarray(i, jnp.int32), jnp.int32(0), jnp.int32(0))

    def omap(i):
        return (jnp.asarray(i, jnp.int32), jnp.int32(0))

    kw = {} if interpret else {"memory_space": pltpu.MemorySpace.VMEM}

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((nb * sb, R), jnp.float32),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((Lr, 128), zmap, **kw),
            pl.BlockSpec((sb, R, W), bmap, **kw),
        ],
        out_specs=pl.BlockSpec((sb, R), omap, **kw),
        interpret=interpret,
    )

    @jax.jit
    def mv(x):
        xpad = jnp.zeros((Lr * 128,), jnp.float32).at[pad : pad + n].set(x)
        y = call(xpad.reshape(Lr, 128), blocks)
        return y.reshape(-1)[:n]

    return mv


# --------------------------------------------------------------------------


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=29768)
    ap.add_argument("--hb", type=int, default=408)
    ap.add_argument("--nnz", type=int, default=50)
    ap.add_argument("--chain", type=int, default=25)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--check-only", action="store_true")
    ap.add_argument("--no-pause", action="store_true")
    ap.add_argument("--sb", type=int, default=8)
    ap.add_argument("--only", default=None,
                    help="substring filter on candidate names")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    import meshdqn_tpu  # noqa: F401  (sets x64 etc.)
    from meshdqn_tpu.ops import banded as bd

    backend = jax.default_backend()
    interpret = backend != "tpu"
    print(f"backend={backend}", flush=True)

    A = build_synthetic(args.n, args.hb, args.nnz)
    n = A.shape[0]
    x_np = np.random.default_rng(1).standard_normal(n).astype(np.float32)
    y_ref = (A @ x_np.astype(np.float64)).astype(np.float64)
    x = jnp.asarray(x_np)

    cands = {}

    # current production layout/form
    A8 = bd.BandedMatrix.from_scipy(A, dtype=jnp.float32, R=8,
                                    aligned128=False)
    mb8 = A8.nbytes / 1e6
    print(f"R=8 layout:   blocks {A8.blocks.shape} = {mb8:.1f} MB", flush=True)
    cands["xla_win_R8"] = (jax.jit(lambda v, M=A8: (M @ v)), mb8)

    for dt, tag in ((jnp.float32, ""), (jnp.bfloat16, "_bf16")):
        blocks, pad, W, L = build_R128(A, dt, jnp)
        mb = blocks.size * blocks.dtype.itemsize / 1e6
        if not tag:
            print(f"R=128 layout: blocks {blocks.shape} = {mb:.1f} MB "
                  f"(pad={pad})", flush=True)
        cands[f"xla_win_R128{tag}"] = (
            make_xla_win_R128(blocks, pad, L, n, jax, jnp), mb)
        cands[f"xla_qsum_R128{tag}"] = (
            make_xla_qsum_R128(blocks, pad, L, n, jax, jnp), mb)
        cands[f"xla_bdot_R128{tag}"] = (
            make_xla_bdot_R128(blocks, pad, L, n, jax, jnp), mb)
        # mxu: Mosaic rejects the (Wr,128)->(W,1) window relayout
        # ("unsupported shape cast"); keep it opt-in via --only mxu.
        modes = ("mxu", "vpu") if (args.only and "mxu" in args.only) else ("vpu",)
        for mode in modes:
            try:
                cands[f"pl_{mode}_R128{tag}"] = (
                    make_pl_kernel(blocks, pad, L, n, jax, jnp, mode,
                                   sb=args.sb, interpret=interpret), mb)
            except Exception as e:  # pragma: no cover
                print(f"pl_{mode}_R128{tag}: build failed: {e}", flush=True)

    if args.only:
        import fnmatch

        pats = args.only.split(",")
        cands = {k: v for k, v in cands.items()
                 if any(fnmatch.fnmatch(k, p) for p in pats)}
    # Pause BEFORE the correctness phase too: the first evaluation of each
    # candidate is its compile, and on the shared chip/core those queue
    # behind two live trainers for many minutes.
    acks = []
    if not (args.no_pause or args.check_only):
        sys.path.insert(0, os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        import bench

        acks = bench.pause_trainers()
    try:
        # correctness
        ok = {}
        for name, (mv, _) in cands.items():
            try:
                with deadline(240):
                    y = np.asarray(mv(x), np.float64)
                err = np.linalg.norm(y - y_ref) / np.linalg.norm(y_ref)
                tol = 1e-5 if "bf16" not in name else 3e-2
                ok[name] = err < tol
                print(f"  {name:22s} rel_err={err:9.2e} "
                      f"{'OK' if ok[name] else 'FAIL'}", flush=True)
            except Exception as e:
                ok[name] = False
                print(f"  {name:22s} EXC {type(e).__name__}: {e}", flush=True)
        if args.check_only:
            return
        chain = args.chain
        print(f"timing: chain={chain} dependent matvecs/call, "
              f"min over {args.reps}", flush=True)
        results = {}
        for name, (mv, mb) in cands.items():
            if not ok.get(name):
                continue

            @jax.jit
            def chained(x0, mv=mv):
                def body(v, _):
                    return mv(v) * 1e-3, None

                v, _ = jax.lax.scan(body, x0, None, length=chain)
                return v

            try:
                with deadline(300):
                    _ = chained(x).block_until_ready()
                walls = []
                for _i in range(args.reps):
                    t0 = time.time()
                    _ = chained(x).block_until_ready()
                    walls.append(time.time() - t0)
                per = min(walls) / chain
                results[name] = per
                print(f"  {name:22s} {per * 1e3:8.3f} ms/matvec  "
                      f"{mb / per / 1e3:6.0f} GB/s on blocks", flush=True)
            except Exception as e:
                print(f"  {name:22s} TIMING EXC {type(e).__name__}: {e}",
                      flush=True)
        if results:
            best = min(results, key=results.get)
            print(f"WINNER: {best} at {results[best] * 1e3:.3f} ms", flush=True)
    finally:
        if acks:
            import bench

            bench.resume_trainers(acks)


if __name__ == "__main__":
    main()
