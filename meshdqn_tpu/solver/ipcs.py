"""IPCS incompressible Navier–Stokes stepper, TPU-native.

Same discretization as the reference (flow_solver.py:47-191): Taylor–Hood
P2/P1, explicit convection, Crank–Nicolson viscosity, 3-step IPCS splitting
with constant system matrices.  The reference leans on MUMPS LU back-solves
per step (flow_solver.py:150-159); sparse triangular solves are hostile to
the TPU, so the design is assemble-once / invert-once / matvec-many:

* the three BC-eliminated system matrices are inverted ONCE on host (f64
  LAPACK) and shipped to device dense — applying an inverse is a single
  HBM-bandwidth-bound matvec that XLA maps onto the MXU, and it batches over
  multiple flows as a matmul;
* every linear RHS piece is a constant sparse operator in ELL layout
  (ops/sparse.py);
* the one nonlinear term is a vmapped element kernel (ops/convection.py);
* drag/lift are precomputed linear functionals (probes.py) — two dots/step;
* the whole time loop is a `lax.scan`, compiled once; all operator data is
  passed to the jitted function as a pytree argument (never baked into HLO).

Precision modes:
  'f64'   — everything f64 (reference-accurate to ~4e-8 drag; default; the
            CPU oracle — f64 is software-emulated and slow on v5e TPUs).
  'f32'   — the TPU fast path; by default uses the FUSED dense-operator
            step (solver/fused.py): 1.0 ms/step on v5e — a full 5000-step
            ys930 solve in ~5 s vs the reference's 109 s (21.9x).  With
            compose_on_host=True (exact f64 operator composition, cast to
            f32) both airfoils match the reference inside 1e-3 on drag AND
            lift (ys930: 1.2e-5 / 4.2e-4; ah93w145: 2.4e-5 / 5.7e-4).
            Requires 'highest' matmul precision (set in
            meshdqn_tpu/__init__) — default bf16 MXU passes cost 4x
            accuracy.
  'df32'  — fused step with split operators: f32 hi + bf16 lo limb per
            matrix, low-limb matvecs as native MXU bf16 passes
            (solver/fused.py fused_step_df32).  Removes the operators'
            systematic f32 entry rounding at ~1.3x the f32 step cost.
            Measured 5000-step v5e gates: ah93w145 drag 1.2e-5 / lift
            1.2e-4 (4.5x better lift than f32's 5.6e-4); ys930 drag
            2.2e-5 / lift 1.6e-3 vs f32's 8.8e-4 — on ys930 the lift
            error is NOT operator-bias-limited: it is phase noise of the
            shedding oscillation seeded by per-step f32 rounding, which
            operator splitting perturbs but does not reduce.  Offered as
            an option, not the default.
  'mixed' — hybrid: velocity path f32, pressure path f64 with iterative
            refinement.  Measured accuracy tracks 'f32' (the error is f32
            phase drift in the velocity path) at ~3x the step cost.

  Phase-noise floor: an all-f64(-emulated) fused step (every matvec and
  the convection kernel in XLA's emulated f64) reaches drag/lift rel err
  8e-9 / 9e-9 at 500 steps on v5e — but at 76 ms/step (~60x f32), i.e.
  XLA's f64 emulation does not use the MXU.  The f64 CPU oracle remains
  the accuracy reference; the f32 fused path passes the reference's own
  1e-3 accuracy threshold on both airfoils and is the throughput path.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import scipy.linalg

from ..fem.assembly import apply_bc_symmetric, assemble_operators
from ..mesh import TriMesh, mark_boundaries
from ..ops.banded import BandedMatrix, permute_interleave_u, rcm_permutation
from ..ops.cg import jacobi_inv, pcg
from ..ops.convection import ConvectionKernel
from ..ops.sparse import EllMatrix
from ..probes import drag_probe, lift_probe


class FlowState(NamedTuple):
    """Velocity/pressure dof vectors on the solver's mesh."""

    u: jnp.ndarray  # (2Ns,)
    p: jnp.ndarray  # (Np,)


class DeviceOperators(NamedTuple):
    """Everything the jitted step needs, as a pytree of device arrays.

    A3 (= the vector mass matrix with velocity BCs) is block-diagonal over
    components with identical blocks, so only the SCALAR mass inverse
    (Ns x Ns) is stored and applied to both components as one (Ns, 2)
    matmul — half the HBM traffic and an eighth of the factorization cost
    of the naive 2Ns x 2Ns inverse.
    """

    A1inv: jnp.ndarray  # (2Ns, 2Ns)
    A2inv: jnp.ndarray  # (Np, Np)
    A3inv_s: jnp.ndarray  # (Ns, Ns) scalar-mass inverse
    A1bc: Optional[EllMatrix]  # only in 'mixed' mode
    A2bc: Optional[EllMatrix]
    A3bc: Optional[EllMatrix]
    R1: EllMatrix
    P1m: EllMatrix  # B - Bn
    Kp: EllMatrix
    BT: EllMatrix
    M: EllMatrix
    G: EllMatrix
    z_u: jnp.ndarray
    z_p: jnp.ndarray
    t1: jnp.ndarray
    t2: jnp.ndarray
    t3: jnp.ndarray
    conv: ConvectionKernel
    drag_u: jnp.ndarray
    drag_p: jnp.ndarray
    lift_u: jnp.ndarray
    lift_p: jnp.ndarray
    rho: jnp.ndarray  # scalars as 0-d arrays
    dt: jnp.ndarray


class CGOperators(NamedTuple):
    """Operator pytree for the large-mesh CG step (method='cg').

    The two big velocity systems stay SPARSE (ELL) and are solved by
    warm-started Jacobi-PCG (ops/cg.py) — no (2Ns, 2Ns) dense inverses, so
    HBM scales linearly with the mesh and the reference's finest sweep rows
    (3395 vertices, smooth_ys930_…csv:2) fit a single chip.  Only the small
    pressure Poisson system (Np = vertex count) keeps a dense inverse,
    optionally refined against the sparse A2 to strip inverse-entry
    rounding.
    """

    A1bc: EllMatrix
    d1inv: jnp.ndarray  # (2Ns,) Jacobi preconditioner for A1bc
    A2inv: jnp.ndarray  # (Np, Np) dense pressure inverse
    A2bc: EllMatrix  # sparse pressure system, for refinement residuals
    A3bc_s: EllMatrix  # (Ns, Ns) scalar mass system
    d3inv: jnp.ndarray  # (Ns,)
    R1: EllMatrix
    P1m: EllMatrix
    Kp: EllMatrix
    BT: EllMatrix
    M: EllMatrix
    G: EllMatrix
    z_u: jnp.ndarray
    z_p: jnp.ndarray
    t1: jnp.ndarray
    t2: jnp.ndarray
    t3: jnp.ndarray
    conv: ConvectionKernel
    drag_u: jnp.ndarray
    drag_p: jnp.ndarray
    lift_u: jnp.ndarray
    lift_p: jnp.ndarray
    rho: jnp.ndarray
    dt: jnp.ndarray


def ipcs_step_cg(dev: CGOperators, state: FlowState, u_star_prev: jnp.ndarray,
                 iters_u: int, iters_m: int, p_refine: int):
    """One IPCS step with CG velocity solves, warm-started from the previous
    step (the dt=1e-3 transient moves slowly, so x0 is already close)."""
    u_n, p_n = state
    ns = dev.A3bc_s.shape[0]
    c = dev.conv(u_n)
    # Step 1: tentative velocity — Jacobi-PCG on the CN system.
    b1 = (dev.R1 @ u_n) + (dev.P1m @ p_n) - dev.rho * c
    b1 = b1 * dev.z_u + dev.t1
    u_star = pcg(
        dev.A1bc, dev.d1inv, b1[:, None], u_star_prev[:, None], iters_u
    )[:, 0]
    # Step 2: pressure correction — small dense inverse (+ refinement).
    b2 = (dev.Kp @ p_n) - (dev.BT @ u_star) / dev.dt
    b2 = b2 * dev.z_p + dev.t2
    p_new = dev.A2inv @ b2
    for _ in range(p_refine):
        r = b2 - (dev.A2bc @ p_new)
        p_new = p_new + dev.A2inv @ r
    # Step 3: velocity correction — scalar mass solve on both components as
    # one dual-RHS CG (shared streamed operator).
    dp = p_new - p_n
    b3 = (dev.M @ u_star) - dev.dt * (dev.G @ dp)
    b3 = b3 * dev.z_u + dev.t3
    B3 = jnp.stack([b3[:ns], b3[ns:]], axis=1)
    X0 = jnp.stack([u_star[:ns], u_star[ns:]], axis=1)
    Y = pcg(dev.A3bc_s, dev.d3inv, B3, X0, iters_m)
    u_new = jnp.concatenate([Y[:, 0], Y[:, 1]])

    new_state = FlowState(u=u_new, p=p_new)
    drag = dev.drag_u @ u_new + dev.drag_p @ p_new
    lift = dev.lift_u @ u_new + dev.lift_p @ p_new
    return new_state, u_star, (drag, lift)


@partial(jax.jit, static_argnames=("n_steps", "iters_u", "iters_m", "p_refine"))
def evolve_cg_n(dev: CGOperators, state: FlowState, u_star0: jnp.ndarray,
                n_steps: int, iters_u: int, iters_m: int, p_refine: int):
    def body(carry, _):
        s, ustar = carry
        s, ustar, dl = ipcs_step_cg(dev, s, ustar, iters_u, iters_m, p_refine)
        return (s, ustar), dl

    (state, ustar), (drags, lifts) = jax.lax.scan(
        body, (state, u_star0), None, length=n_steps
    )
    return state, ustar, (drags, lifts)


class BandedCGOperators(NamedTuple):
    """CG-path operators in gather-free banded layout (cg_layout='banded').

    Same matrices as CGOperators, but the velocity-row operators live in a
    component-INTERLEAVED scalar-RCM dof order (ops/banded.py) so every
    SpMV is a windowed dense contraction — no TPU gather.  Measured on the
    finest sweep row (scripts/cg_microbench.py): the ELL gather matvec was
    11.15 ms for ~12 MB of traffic; banded streams at HBM bandwidth.

    Pressure stays in the ORIGINAL vertex order (the dense A2inv and Kp are
    untouched); coupling operators inject p into its scalar-RCM positions
    (`vert_pos`) with one small scatter per step.
    """

    A1bc: BandedMatrix  # (2Ns, 2Ns) interleaved
    d1inv: jnp.ndarray
    A2inv: jnp.ndarray  # (Np, Np) dense, original pressure order
    A2bc: EllMatrix
    A3bc_s: BandedMatrix  # (Ns, Ns) scalar-RCM
    d3inv: jnp.ndarray
    R1: BandedMatrix  # (2Ns, 2Ns)
    P1m_s: BandedMatrix  # (2Ns, Ns): pressure pre-injected to scalar order
    Kp: EllMatrix  # (Np, Np) small
    BT_s: BandedMatrix  # (Ns, 2Ns): rows at scalar positions of vertices
    Ms: BandedMatrix  # (Ns, Ns) unconstrained scalar mass (dual-RHS apply)
    G_s: BandedMatrix  # (2Ns, Ns)
    vert_pos: jnp.ndarray  # (Np,) int32 scalar-RCM position of vertex v
    z_u: jnp.ndarray
    z_p: jnp.ndarray
    t1: jnp.ndarray
    t2: jnp.ndarray
    t3: jnp.ndarray
    conv: ConvectionKernel  # built with the interleaved dof map
    drag_u: jnp.ndarray
    drag_p: jnp.ndarray
    lift_u: jnp.ndarray
    lift_p: jnp.ndarray
    rho: jnp.ndarray
    dt: jnp.ndarray


def ipcs_step_cg_banded(dev: BandedCGOperators, state: FlowState,
                        u_star_prev: jnp.ndarray, iters_u: int, iters_m: int,
                        p_refine: int):
    """ipcs_step_cg in the banded layout.  u lives component-interleaved in
    scalar-RCM order (u[2j+c] = component c at scalar-RCM node j), so the
    per-component split of step 3 is a free (Ns, 2) reshape; p lives in the
    original vertex order."""
    u_n, p_n = state
    ns = dev.A3bc_s.shape[0]
    c = dev.conv(u_n)
    wdt = dev.t1.dtype
    # Step 1: tentative velocity.
    p_s = jnp.zeros(ns, wdt).at[dev.vert_pos].set(p_n)
    b1 = (dev.R1 @ u_n) + (dev.P1m_s @ p_s) - dev.rho * c
    b1 = b1 * dev.z_u + dev.t1
    u_star = pcg(
        dev.A1bc, dev.d1inv, b1[:, None], u_star_prev[:, None], iters_u
    )[:, 0]
    # Step 2: pressure correction (original ordering; BT result is read off
    # at the vertices' scalar positions).
    bt = (dev.BT_s @ u_star)[dev.vert_pos]
    b2 = (dev.Kp @ p_n) - bt / dev.dt
    b2 = b2 * dev.z_p + dev.t2
    p_new = dev.A2inv @ b2
    for _ in range(p_refine):
        r = b2 - (dev.A2bc @ p_new)
        p_new = p_new + dev.A2inv @ r
    # Step 3: velocity correction — dual-RHS scalar mass solves.
    dp_s = jnp.zeros(ns, wdt).at[dev.vert_pos].set(p_new - p_n)
    V = u_star.reshape(ns, 2)
    b3 = dev.Ms.matmat(V).reshape(-1) - dev.dt * (dev.G_s @ dp_s)
    b3 = b3 * dev.z_u + dev.t3
    Y = pcg(dev.A3bc_s, dev.d3inv, b3.reshape(ns, 2), V, iters_m)
    u_new = Y.reshape(-1)

    new_state = FlowState(u=u_new, p=p_new)
    drag = dev.drag_u @ u_new + dev.drag_p @ p_new
    lift = dev.lift_u @ u_new + dev.lift_p @ p_new
    return new_state, u_star, (drag, lift)


@partial(jax.jit, static_argnames=("n_steps", "iters_u", "iters_m", "p_refine"))
def evolve_cg_banded_n(dev: BandedCGOperators, state: FlowState,
                       u_star0: jnp.ndarray, n_steps: int, iters_u: int,
                       iters_m: int, p_refine: int):
    def body(carry, _):
        s, ustar = carry
        s, ustar, dl = ipcs_step_cg_banded(
            dev, s, ustar, iters_u, iters_m, p_refine
        )
        return (s, ustar), dl

    (state, ustar), (drags, lifts) = jax.lax.scan(
        body, (state, u_star0), None, length=n_steps
    )
    return state, ustar, (drags, lifts)


def ipcs_step(dev: DeviceOperators, state: FlowState, precision: str, refine_iters: int):
    """One IPCS time step; returns (new_state, (drag, lift)).

    In 'mixed' mode the state is (u: f32, p: f64): every 2Ns-sized operator
    runs f32, the Np-sized pressure system runs f64, and the step-3 pressure
    difference is formed in f64 BEFORE casting down (the difference of two
    nearly-equal pressures is exactly where f32 cancels catastrophically).
    """
    u_n, p_n = state
    c = dev.conv(u_n)
    p_n_w = p_n.astype(dev.t1.dtype)  # f32 view of pressure for velocity ops
    # Step 1: tentative velocity
    b1 = (dev.R1 @ u_n) + (dev.P1m @ p_n_w) - dev.rho * c
    b1 = b1 * dev.z_u + dev.t1
    u_star = dev.A1inv @ b1
    # Step 2: pressure correction (f64 in 'mixed')
    pdt = dev.t2.dtype
    u_star_p = u_star.astype(pdt)
    b2 = (dev.Kp @ p_n) - (dev.BT @ u_star_p) / dev.dt.astype(pdt)
    b2 = b2 * dev.z_p + dev.t2
    p_new = (dev.A2inv @ b2.astype(dev.A2inv.dtype)).astype(pdt)
    if precision == "mixed":
        for _ in range(refine_iters):
            r = b2 - (dev.A2bc @ p_new)
            p_new = p_new + (dev.A2inv @ r.astype(dev.A2inv.dtype)).astype(pdt)
    # Step 3: velocity correction; pressure difference formed at pressure
    # precision, cast after subtraction.
    dp = (p_new - p_n).astype(dev.t1.dtype)
    b3 = (dev.M @ u_star) - dev.dt * (dev.G @ dp)
    b3 = b3 * dev.z_u + dev.t3
    ns = dev.A3inv_s.shape[0]
    y = dev.A3inv_s @ jnp.stack([b3[:ns], b3[ns:]], axis=1)  # (Ns, 2)
    u_new = jnp.concatenate([y[:, 0], y[:, 1]])

    new_state = FlowState(u=u_new, p=p_new)
    drag = dev.drag_u @ u_new + dev.drag_p @ p_new
    lift = dev.lift_u @ u_new + dev.lift_p @ p_new
    return new_state, (drag, lift)


@partial(jax.jit, static_argnames=("n_steps", "precision", "refine_iters"))
def evolve_n(dev: DeviceOperators, state: FlowState, n_steps: int,
             precision: str, refine_iters: int):
    def body(s, _):
        return ipcs_step(dev, s, precision, refine_iters)

    return jax.lax.scan(body, state, None, length=n_steps)


@partial(jax.jit, static_argnames=("n_steps",))
def evolve_fused_n(dev, state: FlowState, n_steps: int):
    from .fused import fused_step

    def body(s, _):
        return fused_step(dev, s)

    return jax.lax.scan(body, state, None, length=n_steps)


@partial(jax.jit, static_argnames=("n_steps",))
def evolve_fused_df32_n(dev, lo, state: FlowState, n_steps: int):
    from .fused import fused_step_df32

    def body(s, _):
        return fused_step_df32(dev, lo, s)

    return jax.lax.scan(body, state, None, length=n_steps)




def _quantize_embed(n_old: int, n_new: int):
    """Zero-embedding E (n_new x n_old): E[i, i] = 1."""
    import scipy.sparse as sp

    return sp.csr_matrix(
        (np.ones(n_old), (np.arange(n_old), np.arange(n_old))),
        shape=(n_new, n_old),
    )


def _pad_diag(n: int, start: int):
    """Unit diagonal on rows [start, n) — keeps padded systems invertible
    (inv is block-diagonal with an identity pad block; padded state entries
    start at zero and stay zero through the whole recursion)."""
    import scipy.sparse as sp

    idx = np.arange(start, n)
    return sp.csr_matrix(
        (np.ones(len(idx)), (idx, idx)), shape=(n, n)
    )


# Largest f32 system the on-device LU (jnp.linalg.inv -> XLA
# LuDecompositionBlock custom-call) can factor on a v5e without running out
# of scoped VMEM.  Measured on hardware: 9,216 rows compiles and runs;
# 12,288 rows aborts compilation AND crashes the remote TPU worker.  Above
# this, composition/inversion falls back to host f64 LAPACK (exact, ~45 s
# single-core for the largest dense meshes).
ON_DEVICE_LU_ROW_LIMIT = 9216


@dataclass
class IPCSConfig:
    mu: float = 1e-3
    rho: float = 1.0
    dt: float = 1e-3
    precision: str = "f64"  # 'f64' | 'f32' | 'mixed'
    refine_iters: int = 2  # for 'mixed'
    # None = auto: invert the systems on the accelerator when running the
    # f32 path on a TPU backend (seconds vs ~35 s on a 1-core host).
    invert_on_device: bool | None = None
    # Fused-dense step (solver/fused.py): compose solve+assemble+BC into
    # constant dense operators — no gathers in the linear path.  None =
    # auto: on for the f32 path.
    fused: bool | None = None
    # Compose the fused operators in f64 on host (exact, then cast to f32)
    # instead of f32 on device: ~45 s extra single-core setup, maximally
    # accurate f32 operator entries.
    compose_on_host: bool | None = None  # None = auto: host on CPU, device elsewhere
    # 'dense' = invert-once / fused dense operators (default; best below
    # ~1600 vertices).  'cg' = large-mesh path: sparse velocity systems
    # solved by warm-started Jacobi-PCG, dense inverse only for the small
    # pressure Poisson block — HBM scales linearly with the mesh, covering
    # the reference's finest sweep rows (3395 verts) on one chip.
    method: str = "dense"
    cg_iters_u: int = 25  # PCG iterations, tentative-velocity system
    cg_iters_m: int = 20  # PCG iterations, scalar-mass correction system
    cg_pressure_refine: int = 1  # dense-inverse refinement passes
    # Bound the CG scan length per device call: evolve() splits n_steps
    # into <=cg_chunk-step programs (bit-identical to one long scan — the
    # carried state and warm start are exact).  The remote TPU worker
    # crashes executing >=100-step CG scans at finest-row mesh sizes
    # (~3,300 verts / 27k dofs) while 25-step chunks run fine
    # (scripts/cg_tpu_probe.py); 0 = unchunked.
    cg_chunk: int = 0
    # 'banded' (default): gather-free RCM banded-block SpMV (ops/banded.py)
    # — the TPU production layout (the ELL gather matvec measured 11 ms at
    # the finest sweep rows, ~700x off roofline).  'ell': the round-2 ELL
    # gather layout, kept for comparison/fallback; also the automatic
    # fallback when the RCM bandwidth is too large for dense blocks.
    cg_layout: str = "banded"
    # Storage dtype for the banded matvec operators (A1/A3/R1/P1m/BT/Ms/G):
    # 'f32' or 'bf16'.  bf16 halves the dominant HBM traffic of the
    # bandwidth-bound PCG matvecs (measured 0.330 -> 0.232 ms/matvec at the
    # finest sweep row, scripts/banded_formulation_bench.py) with f32
    # accumulation; preconditioners, vectors and the pressure block stay
    # f32.  Promotion is gated on the 5000-step drag/lift accuracy check
    # (scripts/bf16_banded_gate.py).
    cg_banded_dtype: str = "f32"
    # PCG preconditioner: 'jacobi' (pointwise diagonal) or 'block'
    # (ops/cg.BlockJacobi — dense inverses of cg_block_size diagonal
    # blocks in the RCM ordering; one batched MXU contraction per
    # application, cuts iteration counts where the Hypre/ILU side of the
    # reference's Krylov option would, flow_solver.py:152-155).
    cg_precond: str = "jacobi"
    cg_block_size: int = 64
    # Quantize the fused systems' dof counts up to multiples of pad_quantum
    # (velocity-scalar block; pressure uses pad_quantum//4, min 32) by
    # zero-embedding + unit pad diagonal — EXACT, and collapses the
    # per-mesh-shape compile of the compose/step modules onto shared cache
    # entries.  Resolution sweeps and per-removal deploy rebuilds hit a
    # handful of shape buckets instead of one compile per mesh.
    pad_quantum: int = 0


class IPCSSolver:
    """Assemble-once IPCS stepper for one mesh.

    Parameters mirror the reference's flow/solver params
    (configs/ray_ys930.yaml:2-10).
    """

    def __init__(self, mesh: TriMesh, config: IPCSConfig | None = None):
        self.config = config or IPCSConfig()
        cfg = self.config
        self.mesh = mesh
        self.markers = mark_boundaries(mesh)
        ops = assemble_operators(mesh, self.markers, cfg.mu, cfg.rho, cfg.dt)
        self.operators = ops
        self.ndofs_u = ops.V.ndofs
        self.ndofs_p = ops.Q.ndofs

        # --- BC-eliminated systems, inverted once ------------------------
        A1, A2, A3 = ops.A1, ops.A2, ops.A3
        Ns = ops.V.scalar.ndofs
        A1bc = apply_bc_symmetric(A1, ops.u_bc_mask)
        A2bc = apply_bc_symmetric(A2, ops.p_bc_mask)
        # A3 = vector mass, block-diagonal with identical component blocks
        # and identical per-component BC masks -> invert the scalar block.
        Ms = ops.M[:Ns, :Ns].tocsr()
        A3bc_s = apply_bc_symmetric(Ms, ops.u_bc_mask[:Ns])

        mixed = cfg.precision == "mixed"
        # wdt: dtype of the (large) velocity path; pdt: of the (small,
        # ill-conditioned) pressure path.
        wdt = jnp.float64 if cfg.precision == "f64" else jnp.float32
        pdt = jnp.float64 if cfg.precision in ("f64", "mixed") else jnp.float32
        self.work_dtype = wdt
        self.pressure_dtype = pdt
        inv_dtype = np.float32 if cfg.precision in ("mixed", "f32") else np.float64

        gu, gp = ops.u_bc_values, ops.p_bc_values
        zu = (~ops.u_bc_mask).astype(np.float64)
        zp = (~ops.p_bc_mask).astype(np.float64)
        self._pad = None  # (Ns, nsq, npp, nppq) when pad_quantum is active
        dprobe = drag_probe(mesh, self.markers, cfg.mu)
        lprobe = lift_probe(mesh, self.markers, cfg.mu)
        self.drag = dprobe
        self.lift = lprobe
        # `removable` equivalent of flow_solver.py:75-78, with the
        # numpy-broadcasting bug there fixed: a vertex is removable iff it is
        # not a boundary vertex (SURVEY.md §2a known defects).
        self.removable = ~mesh.boundary_vertex_mask

        if cfg.method == "cg":
            if cfg.precision not in ("f64", "f32"):
                raise ValueError("method='cg' supports precision 'f64'|'f32'")
            self.fused = False
            self.dev_lo = None
            self.work_dtype = wdt
            self.pressure_dtype = wdt
            # Pressure inverse composed exactly in host f64, cast to the
            # working dtype (Np x Np — small even at the finest meshes).
            A2i = scipy.linalg.inv(A2bc.toarray())
            if cfg.cg_layout == "banded":
                built = self._build_cg_banded(
                    ops, A1bc, A2bc, A3bc_s, Ms, A2i, zu, zp, gu, gp,
                    dprobe, lprobe, wdt, mesh,
                )
                if built:
                    return
            A1ell = EllMatrix.from_scipy(A1bc, dtype=wdt)
            A3ell = EllMatrix.from_scipy(A3bc_s, dtype=wdt)
            if cfg.cg_precond == "block":
                from ..ops.cg import block_jacobi_inv

                d1pc = block_jacobi_inv(A1bc, cfg.cg_block_size, dtype=wdt)
                d3pc = block_jacobi_inv(A3bc_s, cfg.cg_block_size, dtype=wdt)
            else:
                d1pc = jacobi_inv(A1ell).astype(wdt)
                d3pc = jacobi_inv(A3ell).astype(wdt)
            self.dev = CGOperators(
                A1bc=A1ell,
                d1inv=d1pc,
                A2inv=jnp.asarray(A2i, dtype=wdt),
                A2bc=EllMatrix.from_scipy(A2bc, dtype=wdt),
                A3bc_s=A3ell,
                d3inv=d3pc,
                R1=EllMatrix.from_scipy(ops.R1, dtype=wdt),
                P1m=EllMatrix.from_scipy(ops.B - ops.Bn, dtype=wdt),
                Kp=EllMatrix.from_scipy(ops.Kp, dtype=wdt),
                BT=EllMatrix.from_scipy(ops.B.T.tocsr(), dtype=wdt),
                M=EllMatrix.from_scipy(ops.M, dtype=wdt),
                G=EllMatrix.from_scipy(ops.G, dtype=wdt),
                z_u=jnp.asarray(zu, dtype=wdt),
                z_p=jnp.asarray(zp, dtype=wdt),
                t1=jnp.asarray(gu - zu * (A1 @ gu), dtype=wdt),
                t2=jnp.asarray(gp - zp * (A2 @ gp), dtype=wdt),
                t3=jnp.asarray(gu - zu * (A3 @ gu), dtype=wdt),
                conv=ConvectionKernel.build(mesh, dtype=wdt),
                drag_u=jnp.asarray(dprobe.d_u, dtype=wdt),
                drag_p=jnp.asarray(dprobe.d_p, dtype=wdt),
                lift_u=jnp.asarray(lprobe.d_u, dtype=wdt),
                lift_p=jnp.asarray(lprobe.d_p, dtype=wdt),
                rho=jnp.asarray(cfg.rho, dtype=wdt),
                dt=jnp.asarray(cfg.dt, dtype=wdt),
            )
            self._cg_ustar = jnp.zeros(self.ndofs_u, dtype=wdt)
            return

        self.fused = (
            cfg.fused
            if cfg.fused is not None
            else cfg.precision in ("f32", "df32")
        )
        self.dev_lo = None
        if self.fused:
            if cfg.precision not in ("f32", "df32"):
                raise ValueError("fused=True requires precision 'f32' or 'df32'")
            from .fused import build_fused_host_f64, build_fused_refined

            self.work_dtype = jnp.float32
            self.pressure_dtype = jnp.float32

            # Inputs to the fused build (possibly shape-quantized below).
            R1sp = ops.R1
            P1msp = (ops.B - ops.Bn).tocsr()
            Kpsp = ops.Kp
            BTsp = ops.B.T.tocsr()
            Mssp = Ms
            Gsp = ops.G
            t1v = gu - zu * (A1 @ gu)
            t2v = gp - zp * (A2 @ gp)
            t3v = gu - zu * (A3 @ gu)
            du, dp_ = dprobe.d_u, dprobe.d_p
            lu, lp_ = lprobe.d_u, lprobe.d_p
            conv_ns_pad = None
            if cfg.pad_quantum:
                import scipy.sparse as sp

                q = cfg.pad_quantum
                qp = max(q // 4, 32)
                npp = A2bc.shape[0]
                nsq = -(-Ns // q) * q
                nppq = -(-npp // qp) * qp
                self._pad = (Ns, nsq, npp, nppq)
                Es = _quantize_embed(Ns, nsq)
                Eu = sp.block_diag((Es, Es)).tocsr()
                Ep = _quantize_embed(npp, nppq)
                pad_u = sp.block_diag(
                    (_pad_diag(nsq, Ns), _pad_diag(nsq, Ns))
                ).tocsr()
                A1bc = (Eu @ A1bc @ Eu.T + pad_u).tocsr()
                A2bc = (Ep @ A2bc @ Ep.T + _pad_diag(nppq, npp)).tocsr()
                A3bc_s = (Es @ A3bc_s @ Es.T + _pad_diag(nsq, Ns)).tocsr()
                R1sp = (Eu @ R1sp @ Eu.T).tocsr()
                P1msp = (Eu @ P1msp @ Ep.T).tocsr()
                Kpsp = (Ep @ Kpsp @ Ep.T).tocsr()
                BTsp = (Ep @ BTsp @ Eu.T).tocsr()
                Mssp = (Es @ Mssp @ Es.T).tocsr()
                Gsp = (Eu @ Gsp @ Ep.T).tocsr()
                zu, zp = Eu @ zu, Ep @ zp
                t1v, t2v, t3v = Eu @ t1v, Ep @ t2v, Eu @ t3v
                du, dp_ = Eu @ du, Ep @ dp_
                lu, lp_ = Eu @ lu, Ep @ lp_
                self.ndofs_u = 2 * nsq
                self.ndofs_p = nppq
                conv_ns_pad = nsq
            # Default: on-device composition with f64-residual iterative
            # refinement — matches the host-f64 operator entries to ~1e-12
            # rel at device speed.  On the CPU backend the f64 matmul
            # sweeps are slower than one LAPACK inversion pass, so host
            # composition stays the CPU default.
            compose_host = (
                cfg.compose_on_host
                if cfg.compose_on_host is not None
                else jax.default_backend() == "cpu"
            )
            if not compose_host and A1bc.shape[0] > ON_DEVICE_LU_ROW_LIMIT:
                # v5e scoped-VMEM cap on the XLA LU custom-call: a
                # 12,288-row f32 LU aborts compilation ("Ran out of memory
                # in memory space vmem … LuDecompositionBlock") and CRASHES
                # the remote TPU worker; 9,216 rows is the largest measured
                # safe size.  Compose on host (exact f64 LAPACK) instead.
                compose_host = True
            builder = build_fused_host_f64 if compose_host else build_fused_refined
            extra = {}
            if not compose_host and cfg.pad_quantum:
                # Quantize the composition modules' COO input lengths so
                # every mesh in a pad bucket compiles to the SAME programs
                # (persistent-cache hits): without this each deploy
                # re-simulation repaid the remote compile service even
                # though the dense shapes were identical (docs/AXON.md).
                extra["nnz_quantum"] = 4096
            built = builder(
                A1bc=A1bc,
                A2bc=A2bc,
                A3bc_s=A3bc_s,
                R1=R1sp,
                P1m=P1msp,
                Kp=Kpsp,
                BT=BTsp,
                Ms=Mssp,
                G=Gsp,
                z_u=zu,
                z_p=zp,
                t1=t1v,
                t2=t2v,
                t3=t3v,
                dt=cfg.dt,
                rho=cfg.rho,
                conv=ConvectionKernel.build(
                    mesh, dtype=jnp.float32, ns_pad=conv_ns_pad,
                    cells_pad=256 if cfg.pad_quantum else 0,
                ),
                drag_u=du,
                drag_p=dp_,
                lift_u=lu,
                lift_p=lp_,
                split=cfg.precision == "df32",
                **extra,
            )
            if cfg.precision == "df32":
                self.dev, self.dev_lo = built
            else:
                self.dev = built
            return

        on_device = cfg.invert_on_device
        if on_device is None:
            on_device = cfg.precision == "f32" and jax.default_backend() == "tpu"

        def _inv(A_sp):
            # Same v5e scoped-VMEM LU cap as the fused compose path (see
            # ON_DEVICE_LU_ROW_LIMIT above) — fall back to host LAPACK
            # rather than crash the remote worker.
            if on_device and A_sp.shape[0] <= ON_DEVICE_LU_ROW_LIMIT:
                A = jnp.asarray(A_sp.toarray(), dtype=jnp.float32)
                return jnp.linalg.inv(A).astype(inv_dtype)
            return jnp.asarray(
                scipy.linalg.inv(A_sp.toarray(), overwrite_a=True).astype(inv_dtype)
            )

        A1i = _inv(A1bc)
        A2i = _inv(A2bc)
        A3i_s = _inv(A3bc_s)

        self.dev = DeviceOperators(
            A1inv=jnp.asarray(A1i),
            A2inv=jnp.asarray(A2i),
            A3inv_s=jnp.asarray(A3i_s),
            A1bc=None,
            A2bc=EllMatrix.from_scipy(A2bc, dtype=pdt) if mixed else None,
            A3bc=None,
            R1=EllMatrix.from_scipy(ops.R1, dtype=wdt),
            P1m=EllMatrix.from_scipy(ops.B - ops.Bn, dtype=wdt),
            Kp=EllMatrix.from_scipy(ops.Kp, dtype=pdt),
            BT=EllMatrix.from_scipy(ops.B.T.tocsr(), dtype=pdt),
            M=EllMatrix.from_scipy(ops.M, dtype=wdt),
            G=EllMatrix.from_scipy(ops.G, dtype=wdt),
            z_u=jnp.asarray(zu, dtype=wdt),
            z_p=jnp.asarray(zp, dtype=pdt),
            t1=jnp.asarray(gu - zu * (A1 @ gu), dtype=wdt),
            t2=jnp.asarray(gp - zp * (A2 @ gp), dtype=pdt),
            t3=jnp.asarray(gu - zu * (A3 @ gu), dtype=wdt),
            conv=ConvectionKernel.build(mesh, dtype=wdt),
            drag_u=jnp.asarray(dprobe.d_u, dtype=wdt),
            drag_p=jnp.asarray(dprobe.d_p, dtype=pdt),
            lift_u=jnp.asarray(lprobe.d_u, dtype=wdt),
            lift_p=jnp.asarray(lprobe.d_p, dtype=pdt),
            rho=jnp.asarray(cfg.rho, dtype=wdt),
            dt=jnp.asarray(cfg.dt, dtype=wdt),
        )

    # ------------------------------------------------------------------
    def _build_cg_banded(self, ops, A1bc, A2bc, A3bc_s, Ms, A2i, zu, zp,
                         gu, gp, dprobe, lprobe, wdt, mesh) -> bool:
        """Construct BandedCGOperators (cg_layout='banded').

        Returns False (caller falls back to the ELL layout) when the RCM
        bandwidth is too large for dense banded blocks to pay off.
        """
        import scipy.sparse as sp

        cfg = self.config
        Ns = ops.V.scalar.ndofs
        Np = A2bc.shape[0]
        A1, A2, A3 = ops.A1, ops.A2, ops.A3
        perm_s = rcm_permutation(Ms)
        rank_s = np.empty(Ns, dtype=np.int64)
        rank_s[perm_s] = np.arange(Ns)
        n2o_u = permute_interleave_u(Ns, rank_s)
        o2n_u = np.empty_like(n2o_u)
        o2n_u[n2o_u] = np.arange(2 * Ns)

        A1p = A1bc.tocsr()[n2o_u][:, n2o_u].tocoo()
        span = int(np.abs(A1p.row - A1p.col).max())
        # Bandwidth guard: blocks are (n, ~2*span); past ~n/4 the dense
        # band stores too many zeros to beat even the slow gather.
        if 2 * span > max(512, A1p.shape[0] // 4):
            return False

        A1p = A1p.tocsr()
        A3p = A3bc_s.tocsr()[perm_s][:, perm_s].tocsr()
        Msp = Ms.tocsr()[perm_s][:, perm_s].tocsr()
        R1p = ops.R1.tocsr()[n2o_u][:, n2o_u].tocsr()
        # Injection of pressure dofs (vertices, original order) into their
        # scalar-RCM positions: S[v, rank_s[v]] = 1 (P2 scalar dofs [0, V)
        # are the vertices, fem/spaces.py:8).
        vert_pos = rank_s[:Np]
        S = sp.csr_matrix(
            (np.ones(Np), (np.arange(Np), vert_pos)), shape=(Np, Ns)
        )
        P1m_sp = ((ops.B - ops.Bn).tocsr()[n2o_u] @ S).tocsr()
        G_sp = (ops.G.tocsr()[n2o_u] @ S).tocsr()
        BT_sp = (S.T @ ops.B.T.tocsr())[:, n2o_u].tocsr()

        t1v = (gu - zu * (A1 @ gu))[n2o_u]
        t3v = (gu - zu * (A3 @ gu))[n2o_u]
        if cfg.cg_precond == "block":
            # Blocks along the RCM ordering (A1p/A3p already permuted) so
            # each dense block captures a contiguous, tightly-coupled
            # stretch of the band.
            from ..ops.cg import block_jacobi_inv

            d1pc = block_jacobi_inv(A1p, cfg.cg_block_size, dtype=wdt)
            d3pc = block_jacobi_inv(A3p, cfg.cg_block_size, dtype=wdt)
        else:
            d1 = A1p.diagonal()
            d3 = A3p.diagonal()
            d1pc = jnp.asarray(np.where(d1 != 0, 1.0 / np.where(d1 != 0, d1, 1.0), 1.0), dtype=wdt)
            d3pc = jnp.asarray(np.where(d3 != 0, 1.0 / np.where(d3 != 0, d3, 1.0), 1.0), dtype=wdt)
        bdt = jnp.bfloat16 if cfg.cg_banded_dtype == "bf16" else wdt
        band = partial(BandedMatrix.from_scipy, dtype=bdt)
        self.dev = BandedCGOperators(
            A1bc=band(A1p),
            d1inv=d1pc,
            A2inv=jnp.asarray(A2i, dtype=wdt),
            A2bc=EllMatrix.from_scipy(A2bc, dtype=wdt),
            A3bc_s=band(A3p),
            d3inv=d3pc,
            R1=band(R1p),
            P1m_s=band(P1m_sp),
            Kp=EllMatrix.from_scipy(ops.Kp, dtype=wdt),
            BT_s=band(BT_sp),
            Ms=band(Msp),
            G_s=band(G_sp),
            vert_pos=jnp.asarray(vert_pos, dtype=jnp.int32),
            z_u=jnp.asarray(zu[n2o_u], dtype=wdt),
            z_p=jnp.asarray(zp, dtype=wdt),
            t1=jnp.asarray(t1v, dtype=wdt),
            t2=jnp.asarray(gp - zp * (A2 @ gp), dtype=wdt),
            t3=jnp.asarray(t3v, dtype=wdt),
            conv=ConvectionKernel.build(mesh, dtype=wdt, dof_perm=o2n_u),
            drag_u=jnp.asarray(dprobe.d_u[n2o_u], dtype=wdt),
            drag_p=jnp.asarray(dprobe.d_p, dtype=wdt),
            lift_u=jnp.asarray(lprobe.d_u[n2o_u], dtype=wdt),
            lift_p=jnp.asarray(lprobe.d_p, dtype=wdt),
            rho=jnp.asarray(cfg.rho, dtype=wdt),
            dt=jnp.asarray(cfg.dt, dtype=wdt),
        )
        self._u_export_idx = jnp.asarray(o2n_u)
        self._cg_ustar = jnp.zeros(self.ndofs_u, dtype=wdt)
        return True

    def export_u(self, u):
        """Map a velocity dof vector from the solver's internal layout to
        the canonical concatenated [ux; uy] layout (identity unless the
        banded CG layout's interleaved RCM order is active)."""
        idx = getattr(self, "_u_export_idx", None)
        return u if idx is None else u[idx]

    def unpad_u(self, u):
        """Strip pad_quantum padding from a velocity dof vector."""
        if self._pad is None:
            return u
        ns, nsq, _, _ = self._pad
        return jnp.concatenate([u[:ns], u[nsq : nsq + ns]])

    def unpad_p(self, p):
        if self._pad is None:
            return p
        return p[: self._pad[2]]

    def initial_state(self) -> FlowState:
        """Zero initial condition, like the reference's fresh Functions
        (flow_solver.py:92-93).  Also resets the CG warm-start vector so a
        second trajectory through the same solver reproduces a fresh one
        (the fixed-iteration PCG has no convergence check; a stale x0 from
        a previous trajectory would change early-step solutions)."""
        self.reset_warm_start()
        return FlowState(
            u=jnp.zeros(self.ndofs_u, dtype=self.work_dtype),
            p=jnp.zeros(self.ndofs_p, dtype=self.pressure_dtype),
        )

    def reset_warm_start(self):
        """Zero the PCG warm-start (no-op for non-CG methods)."""
        if self.config.method == "cg":
            self._cg_ustar = jnp.zeros_like(self._cg_ustar)

    def evolve(self, state: FlowState, n_steps: int = 1):
        """Advance n_steps; returns (state, drags (n,), lifts (n,))."""
        if self.config.method == "cg":
            cfg = self.config
            chunk = cfg.cg_chunk if cfg.cg_chunk > 0 else n_steps
            ds, ls = [], []
            done = 0
            step_fn = (
                evolve_cg_banded_n
                if isinstance(self.dev, BandedCGOperators)
                else evolve_cg_n
            )
            while done < n_steps:
                n = min(chunk, n_steps - done)
                state, self._cg_ustar, (d, l) = step_fn(
                    self.dev, state, self._cg_ustar, n,
                    cfg.cg_iters_u, cfg.cg_iters_m, cfg.cg_pressure_refine,
                )
                ds.append(d)
                ls.append(l)
                done += n
            drags = ds[0] if len(ds) == 1 else jnp.concatenate(ds)
            lifts = ls[0] if len(ls) == 1 else jnp.concatenate(ls)
            return state, drags, lifts
        if self.fused:
            if self.dev_lo is not None:
                state, (drags, lifts) = evolve_fused_df32_n(
                    self.dev, self.dev_lo, state, n_steps
                )
            else:
                state, (drags, lifts) = evolve_fused_n(self.dev, state, n_steps)
        else:
            state, (drags, lifts) = evolve_n(
                self.dev, state, n_steps, self.config.precision,
                self.config.refine_iters,
            )
        return state, drags, lifts

    def solve(
        self,
        n_steps: int,
        save_steps: int | None = None,
        state: FlowState | None = None,
    ):
        """Run the full transient solve.

        Mirrors the reference's ground-truth loop (Env2DAirfoil.py:111-125):
        every `save_steps` steps, snapshot (u, p, drag, lift) — drag/lift
        sampled from the state just computed.

        CG method + explicit `state`: call reset_warm_start() first if the
        state does not continue the solver's previous trajectory.
        """
        if state is None:
            state = self.initial_state()
        if save_steps is None:
            save_steps = n_steps
        assert n_steps % save_steps == 0
        drags, lifts, snaps = [], [], []
        for _ in range(n_steps // save_steps):
            state, d, l = self.evolve(state, save_steps)
            drags.append(d)
            lifts.append(l)
            snaps.append(state)
        drags = jnp.concatenate(drags)
        lifts = jnp.concatenate(lifts)
        # Exported snapshots use the canonical [ux; uy] layout; `state` stays
        # in the solver's internal layout so it can continue evolve().
        if getattr(self, "_u_export_idx", None) is not None:
            snaps = [FlowState(u=self.export_u(s.u), p=s.p) for s in snaps]
        return {
            "state": state,
            "drags": drags,
            "lifts": lifts,
            "snapshots": snaps,
            "snap_drags": np.asarray(drags.reshape(-1, save_steps)[:, -1]),
            "snap_lifts": np.asarray(lifts.reshape(-1, save_steps)[:, -1]),
        }
