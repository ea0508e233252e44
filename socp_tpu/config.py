"""Solver configuration (static under jit) and result types.

SURVEY.md section 5 ("Config / flag system"): a frozen dataclass whose fields
are all hashable Python scalars, passed as a static argument to the jitted
solver core.
"""

from __future__ import annotations

import dataclasses
import enum


class KKTStrategy(enum.Enum):
    """How the per-iteration KKT system is factored (SURVEY.md section 7.1).

    Informational: the strategy is selected structurally, not by flag —
    `socp_tpu.solve`/`solve_batch` use DENSE (condensed normal equations);
    `parallel.schur.solve_block` takes a BlockSocpProblem and is the
    BLOCK_SCHUR path."""

    DENSE = "dense"            # condensed normal equations, one dense Cholesky
    BLOCK_SCHUR = "block_schur"  # per-block Cholesky + psum-reduced Schur complement


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    max_iter: int = 50
    abstol: float = 1e-8
    reltol: float = 1e-8
    feastol: float = 1e-8
    # Relaxed acceptance thresholds (ECOS-style "optimal, inaccurate"): when
    # the solver stalls at its numerically achievable floor (bad KKT
    # direction / max-iter), the BEST iterate seen is restored and accepted
    # as optimal if it meets these.
    abstol_inacc: float = 5e-5
    reltol_inacc: float = 5e-5
    feastol_inacc: float = 1e-4
    # A combined Newton direction whose (post-refinement) relative KKT
    # residual exceeds this is unusable: stop instead of stepping.
    solve_quality_tol: float = 0.25
    step_frac: float = 0.99
    # Static regularization added to the *equilibrated* (unit-diagonal)
    # condensed-system diagonals — i.e. relative to each row's own scale.
    # Keeps the Cholesky PD when the IPM KKT turns numerically indefinite
    # near convergence (kappa ~ 1/mu^2); accuracy is restored by iterative
    # refinement (SURVEY.md section 7.3.1).
    delta_reg: float = 1e-11
    # Augmented-Lagrangian weight rho on A'A in the condensed (1,1) block.
    # Makes H = P + rho A'A + G'W^-2 G positive definite under the standard
    # well-posedness assumption rank([P;A;G]) = n, with an EXACT dy
    # correction (no perturbation).  Only used when equality constraints
    # are present.
    aug_rho: float = 1.0
    # Iterative-refinement rounds applied to every KKT solve (residual of the
    # full 3x3 system, re-solve with the cached factorization, correct).
    refine_steps: int = 1
    # Refinement rounds for the affine (predictor) direction only.  Its
    # accuracy barely matters — it just sets sigma and the corrector RHS —
    # so skipping its refinement drops one back-solve + one residual pass
    # per IPM iteration at no accuracy cost (the combined direction, which
    # the iterate actually steps along, keeps refine_steps).
    refine_affine: int = 0
    # Compute residuals/refinement in f64 even when iterates are f32.
    refine_in_f64: bool = False
    # Factorization dtype ("float32" or None = carry dtype).  The
    # dsgesv-style mixed-precision scheme: iterates and refinement residuals
    # stay f64 while the O(n^3)/O(mn^2) factor pipeline runs on the f32 MXU
    # (~100x faster than emulated f64 on TPU); iterative refinement against
    # the f64 3x3 system restores 1e-8-grade directions (SURVEY.md 7.3.1).
    factor_dtype: str | None = None
    # Run the ENTIRE IPM in dd32 (double-word f32): dd carries, dd cone
    # kernels, Ozaki MXU matvecs — zero f64 in the hot loop.  The fast path
    # on TPU (f64 emulation there is ~50-100x slower than f32); reaches the
    # same 1e-8 tolerances.  factor_dtype is ignored when set.
    native_dd: bool = False
    # SOC bucket granularity: block dims are padded up to a multiple of this
    # (and to >= 2) so heterogeneous cones batch into dense bucket arrays.
    bucket_multiple: int = 8
    # VMEM-resident Pallas kernels for the dd KKT factor/back-solves (one
    # kernel per factor or forward+backward pair instead of ~2n XLA
    # dispatches; 4-16x faster at n=128-512 single-instance, measured).
    # Batched lockstep solves route through INSTANCE-TILED variants (a
    # (T, n, n) tile of instances per grid step via custom_vmap —
    # ops/pallas_chol.py) rather than the serialized vmap grid.  None =
    # auto: enabled by api.solve for single-instance native_dd solves on
    # TPU with n small enough that the factor fits VMEM; the batched
    # default follows measured results (see api._resolve_pallas).
    use_pallas: bool | None = None
    # Apply the dd KKT factor via its EXPLICIT triangular inverse
    # (kkt/dd_dense.DDEqCholInv): each back-solve becomes two presliced
    # Ozaki matvecs (constant kernel count, MXU work) instead of a
    # 2n/unroll-step substitution chain — the substitutions are pure
    # launch latency at lockstep batch sizes (~28us/step measured on TPU
    # v5e).  The inverse is built once per factorization by
    # dd_linalg.dd_chol_tri_inv (FUSED panel Cholesky + base inversion:
    # panel solves ride MXU GEMMs); forward error stays O(eps_dd * kappa),
    # same order as substitution (validated head-to-head), and per-solve
    # refinement absorbs the slightly larger residual constant.  None =
    # auto: on for native_dd solves (both batched and single); ignored
    # where use_pallas routes solves through the VMEM kernels.
    invert_factor: bool | None = None
    # Reduce the block-Schur complement S = sum_i A_i H_i^-1 A_i' with an
    # explicit ppermute ring instead of one monolithic psum (overlappable
    # ICI hops; SURVEY.md 7.3.5).  Equivalent numerics up to reassociation;
    # opt-in until pod-scale measurements exist.
    ring_schur: bool = False
    # Gondzio multiple centrality correctors: after the Mehrotra combined
    # direction, up to this many extra correctors are computed, each from
    # ONE additional (unrefined) back-solve on the already-factored KKT.
    # A corrector pushes the TRIAL point's Jordan spectral products back
    # into [0.1, 10] x sigma*mu (only outlier blocks are touched —
    # cones.ops.eig_clip_delta) and is accepted per instance only if it
    # lengthens the step by >= 0.01 (Gondzio's gamma*delta rule).  Cuts
    # iteration counts on hard/large instances for ~5% extra work per
    # corrector; 0 = classic Mehrotra only.  None = auto (resolved by
    # api.solve*): 1 on TPU native_dd paths — there the dd factorization
    # dominates the iteration so trading one cheap back-solve for ~16-21%
    # fewer iterations (measured, scripts/gondzio_iters.py) is a clear
    # win — and 0 elsewhere (keeps CPU/f64 runs oracle-comparable).
    gondzio_correctors: int | None = None
    # Warm-start recentering: a supplied (x, y, s, z) start has its s and z
    # lifted along the cone identity until their smallest Jordan eigenvalue
    # is >= warm_push x the iterate's own mean magnitude.  A warm point ON
    # the boundary destroys the NT scaling, and a converged point's s_i z_i
    # products are maximally uncentered — the lift trades a little restart
    # mu for centrality the predictor-corrector can digest.
    warm_push: float = 0.05
    # Record the per-iteration table [pcost, dcost, gap, pres, dres, step]
    # into Solution.history (a (max_iter, 6) array; rows beyond the final
    # iteration stay zero).  Off by default: it adds a small carry.
    collect_history: bool = False
    verbose: bool = False


DEFAULT_CONFIG = SolverConfig()
