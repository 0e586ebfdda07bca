"""Fused MD chunk kernel: the production microscale integration path.

One Pallas program integrates one MD job (replica box) for a whole chunk
of velocity-Verlet steps with positions, velocities, forces, thermostat
and virial accumulators resident in VMEM — zero HBM round-trips between
steps.  This replaces the LAMMPS instances the reference spawns per
quadrature point (stmd_problem.h:156-341: fix nvt + fix deform + run) as
the hot loop of the whole application.

Design (validated by on-hardware probes, PLAN_NEXT.md round-2 plan):

* Pair interactions use a fixed-width neighbor list (K, NT, 128) built in
  XLA at chunk boundaries.  Neighbor coordinates are fetched in-kernel by
  multi-pass lane gathers (``jnp.take_along_axis`` along lanes lowers to
  a hardware gather on v5e — measured at ~1 multiply-equivalent).
* Periodic images are precomputed per pair slot at list build and stay
  exact under affine box deformation (fix-deform holds fractional
  coordinates, so image integers never change) — no per-pair
  round()/min-image work inside the step loop, and triclinic boxes are
  handled exactly.
* Per-pair force-field parameters (4*eps*weight, sigma^2) are baked into
  per-slot channels at build, so the kernel has no type-table lookups;
  OPLS special-bonds exclusions are just zero weights.
* The Nose-Hoover chain (NHC_LEN=3, MTK) runs on scalars inside the
  kernel; KE reductions read the VMEM-resident velocity scratch.
* fix-deform 'erate remap x' (in.strain.lammps) is applied per step from
  (h0, eps, step-fraction) scalars — upper-triangular algebra only.
* The virial is accumulated per sampled step as the exact pair sum
  sum(fpair * d (x) d) — matching the autodiff strain-derivative virial
  of the XLA path (tests assert this).

Layouts: state channels are (8, NT, 128) tile-major rows
[x y z vx vy vz ftm2v/m m/ftm2v]; neighbor channels are (K, NT, 128).
"""
from __future__ import annotations

import os
from dataclasses import dataclass
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..md import box as B
from ..md import neighbor as NB

LANE = 128
NHC_LEN = 3

# fscal layout
_F_DT = 0
_F_T = 1
_F_H0 = 2  # 2..7: lx ly lz xy xz yz
_F_EPS = 8  # 8..13 Voigt strain of the deform run
_F_VXI = 14  # 14..16
_FSCAL = 24

# iscal layout
_I_NRUN = 0   # steps to integrate this call
_I_GSTEP0 = 1  # global step index at call entry (deform fraction)
_I_NTOT = 2   # total steps of the deform run
_ISCAL = 4

# sacc (outputs) layout
_S_VXI = 0  # 0..2
_S_PRESS = 3  # 3..8 accumulated Voigt pressure (pressure units * steps)
_S_KE2 = 9   # last 2*KE (diagnostic)
_SACC = 16


@dataclass(frozen=True)
class FusedSpec:
    """Static configuration of the fused chunk kernel."""

    n_atoms: int
    nt: int  # lane tiles (ceil(n/128))
    k: int  # neighbor slots (multiple of 8)
    cutoff2: float  # LJ/pair cutoff squared
    ndof: int
    boltz: float
    ftm2v: float
    nktv2p: float
    tdamp: float = 100.0
    r2min: float = 0.25  # close-range clamp (matches forcefields/lj.py)
    coul: bool = False
    coul_cutoff2: float = 0.0
    bonded: bool = False  # chain-structured bonds/angles/dihedrals
    interpret: bool = False
    # all-pairs tile-pair mode: no neighbor list, no gathers, no rebuilds —
    # per-pair parameters are dense (NPAD, NPAD) VMEM-resident matrices
    # (lj1 = 48 eps sig^12, lj2 = 24 eps sig^6 — LAMMPS pair_lj's
    # precomputed force coefficients) and min-image integers are CACHED in
    # VMEM scratch, refreshed every ``img_refresh`` steps.  The cache is
    # exact, not approximate: with every box height > 2x cutoff at most
    # one periodic image of a pair can sit inside the cutoff, and a pair's
    # min-image integer only changes while it is outside the cutoff (the
    # change happens at |d| >= L/2 > rc), where the force is zero either
    # way.  Only the upper block triangle (u >= t) is computed — the
    # reaction force rides a (128,128) XLU transpose, concurrent with the
    # VPU pair math.  The whole strain/sampling run is ONE kernel call.
    # Wins below ~1k atoms where (NT^2) 128x128 tile math at VPU rate
    # beats gather-bound list traversal; the HMM's per-qp boxes (~512
    # atoms) live exactly there.
    allpairs: bool = False
    # jobs packed per Pallas program (all-pairs LJ/OPLS only): J > 1
    # interleaves J independent jobs' block chains in one program,
    # filling ILP slack (measured +16% at J=2 on v5e).  State stacks
    # J tile groups; iscal/fscal carry J rows; sacc returns J rows.
    jobs: int = 1
    img_refresh: int = 20  # steps between min-image cache refreshes;
    # exactness needs drift < (L/2 - rc) between refreshes — ~2.3 A for
    # the 24.6 A melt, >100 steps at melt velocities; 20 is conservative
    # Stillinger-Weber all-pairs mode (single species, p=4/q=0 family):
    # two tile-pair sweeps per step — moments (s, g^2, m, Q) then the
    # hand-derived per-pair force with per-atom three-body adjoints
    # (same math as ops/sw_pallas._sw_force_kernel).  Parameter-free
    # pairs: no dense matrices at all; occupancy from the invm state row.
    sw: bool = False
    sw_params: tuple = ()  # (eps, sigma, a, lam, gamma, costheta0, A, B)
    # offset-pattern bonded terms (pack_patterns): the general-topology
    # in-kernel bonded path for all-atom molecules whose partners sit at
    # small static offsets ([C H H H] layout).  Mutually exclusive with
    # ``bonded`` (the linear-chain fast path).
    bonded_pattern: tuple = ()
    # roll-based SHAKE/RATTLE (pack_shake): the reference's
    # ``fix shake ... m 1.0`` (in.strain.lammps) — C-H bonds rigid.
    # Non-empty offsets enable the constraint steps inside the kernel;
    # d0^2 rows ride the ``shk`` channel.  spec.ndof must already carry
    # the -n_constraints correction (engine.MDSystem.ndof semantics).
    shake_offsets: tuple = ()
    shake_iters: int = 20   # fix shake's default iteration bound
    rattle_iters: int = 10
    shake_relax: float = 0.8
    # frozen external per-atom force channel (3, NT, 128): the kspace
    # (PME) contribution held constant across a fused chunk — an rRESPA
    # outer level (LAMMPS run_style respa's kspace slot) with the split
    # total = [plain cut coulomb, in kernel] + [smooth remainder, frozen]
    fext: bool = False
    # min-image cache precision: bf16 halves the 3 image planes' VMEM.
    # Exact, not approximate — the cached values are small integers
    # (|n| <= 2 even in tilted boxes), exactly representable in bf16;
    # the kernel converts to f32 before the FMA reconstruction.  Flag
    # kept so hardware Mosaic issues could fall back to f32 planes.
    img_bf16: bool = True
    # triangle-packed parameter planes + min-image cache (pack_tri_plane
    # layout).  The round-5 hardware A/B measured the dense (NPAD, NPAD)
    # f32 planes a few percent FASTER at the clamped gate sizes (packing
    # buys VMEM the dense-footprint gate never spends, and its unpack
    # indexing isn't free), so dense is the production default and
    # material.py only packs under SCEMA_TRI_PLANES=1.  The spec default
    # stays True for direct FusedSpec users of the packed layout tests.
    tri_packed: bool = True
    # Ewald real-space splitting parameter: > 0 switches the in-kernel
    # Coulomb pair force from plain cut (qq/r^2) to the damped erfc form
    # qq (erfc(a r)/r + 2a/sqrt(pi) exp(-a^2 r^2)) / r^2 — LAMMPS
    # pair_lj_cut_coul_long's EWALD_F expression (pair_lj_cut_coul_long
    # .cpp), with erfc by the Abramowitz-Stegun 7.1.26 polynomial that
    # shares the pair's exp.  With this the kernel computes the EXACT
    # weighted real-space Ewald sum every step and the frozen fext
    # remainder shrinks to [reciprocal + excluded-pair erf correction] —
    # the genuinely smooth part (no dense (N, N) erf term re-evaluated
    # per chunk).  All-pairs mode only.
    ewald_alpha: float = 0.0
    # HBM-streamed neighbor channels (gather-list mode only): when > 0,
    # the (K, NT, 128) channel set stays in HBM (memory_space ANY) and
    # the pair loop walks it in K-chunks of ``k_chunk`` slots with
    # double-buffered async copies into VMEM scratch.  Removes the list
    # kernel's VMEM size ceiling entirely — the round-4 hardware ladder
    # measured the windowed form OOM at the first above-all-pairs-gate
    # charged size (K~1112 at a 12 A cutoff: 7 channels x 13 MB + 67 MB
    # of register-allocator spill slots > 128 MB physical VMEM).  The
    # channels scale O(N K) in HBM; VMEM holds 2 x k_chunk slots.
    # Requires k % k_chunk == 0 (material.py pads K up).
    k_chunk: int = 0
    # bf16 pair-force tiles with f32 accumulators (all-pairs LJ/OPLS
    # only): the per-block force tiles wx/wy/wz are downcast to bf16
    # ONCE and that same value feeds both the lane-side accumulation and
    # the reaction transpose — Newton's third law holds exactly despite
    # the rounding, and the (128, 128) XLU reaction transposes (the
    # measured wall of the cached-Newton design, PLAN_NEXT round-3
    # ledger) move half the bytes.  Geometry (dx, r2, 1/r2) and the
    # accumulators stay f32: displacement differences cancel
    # catastrophically in bf16 and accumulation order noise would
    # swamp the virial.  Per-pair force error ~0.4% (1 bf16 ulp),
    # unbiased — validated against f32 stress statistics in
    # tests/test_md_fused.py and gated by the bench A/B on silicon.
    pair_bf16: bool = False
    # streamed-list batch grid: the kernel runs under grid=(B,) with one
    # program per job, reading its job's slice of the leading-B ANY
    # channels via program_id(0) (see _streamed_call — the job vmap
    # lowers HERE instead of to Pallas's blocked batching, which ANY
    # operands reject, or to lax.map/unrolled calls, whose surrounding
    # fusions XLA charges against a 16 MB scoped-vmem default no matter
    # what vmem_limit_bytes says — both measured on silicon, round 5).
    batch_grid: bool = False


# topo channel rows (chain-structured bonded terms; term k starts at atom k)
_T_BMASK = 0  # bond (i, i+1) exists
_T_BK = 1
_T_BR0 = 2
_T_AMASK = 3  # angle (i, i+1, i+2)
_T_AK = 4
_T_ATH0 = 5
_T_DMASK = 6  # dihedral (i, i+1, i+2, i+3)
_T_DK1 = 7  # 7..10: OPLS K1..K4
_TOPO = 16


# 2/sqrt(pi) — LAMMPS pair_lj_cut_coul_long's EWALD_F
_EWALD_F = 1.12837916709551257


def tri_nblk(nt: int) -> int:
    """Number of (128, 128) blocks in the upper block triangle."""
    return nt * (nt + 1) // 2


def tri_blk(t: int, u: int, nt: int) -> int:
    """Packed row-block index of upper-triangle block (t, u), u >= t.

    The all-pairs kernel only ever reads blocks with u >= t (Newton
    halving), and every per-pair parameter plane is symmetric — so the
    dense (NPAD, NPAD) planes are stored as their upper block triangle
    (NBLK*128, 128), a 1/2 * (1 + 1/NT) footprint.  Blocks are ordered
    t-major: (0,0) (0,1) .. (0,NT-1) (1,1) .."""
    return t * nt - t * (t - 1) // 2 + (u - t)


def pack_tri_plane(dense, nt: int):
    """Pack a symmetric (NPAD, NPAD) parameter plane into its upper
    block triangle (NBLK*128, 128): packed block k = tri_blk(t, u)
    holds dense[u*128:(u+1)*128, t*128:(t+1)*128] (rows = source tile u,
    lanes = target tile t — the orientation forces_allpairs reads)."""
    dense = np.asarray(dense)
    npad = nt * LANE
    assert dense.shape == (npad, npad), (dense.shape, npad)
    blocks = []
    for t in range(nt):
        for u in range(t, nt):
            blocks.append(dense[u * LANE:(u + 1) * LANE,
                                t * LANE:(t + 1) * LANE])
    return np.concatenate(blocks, axis=0)


def erfc_poly(x, ex):
    """erfc(x) for x >= 0 by Abramowitz-Stegun 7.1.26, given ex =
    exp(-x^2) (shared with the Ewald damped-force factor).  |err| <=
    1.5e-7 in f64, ~5e-7 evaluated in f32 (tests/test_allatom_fused.py
    ::test_erfc_poly_accuracy) — the same polynomial LAMMPS's
    pair_lj_cut_coul_long evaluates."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    return t * ex * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))


def _ewald_fcoul(qq, r2c, inv_r, inv_r2, alpha):
    """Damped real-space Ewald pair force factor (see
    FusedSpec.ewald_alpha): F/r = qq (erfc(x)/r + EWALD_F a e^{-x^2})
    / r^2 with x = a r — LAMMPS pair_lj_cut_coul_long's expression,
    shared by the all-pairs and gather-list pair loops."""
    x = alpha * (r2c * inv_r)
    ex = jnp.exp(-x * x)
    return qq * inv_r2 * (erfc_poly(x, ex) * inv_r + _EWALD_F * alpha * ex)


def _asin_poly(x):
    """asin on [-0.5, 0.5] (Cephes single-precision minimax)."""
    z = x * x
    p = (((4.2163199048e-2 * z + 2.4181311049e-2) * z + 4.5470025998e-2) * z
         + 7.4953002686e-2) * z + 1.6666752422e-1
    return x + x * z * p


def _acos_poly(x):
    """Elementwise arccos from the asin kernel (Mosaic has no acos/atan2)."""
    ax = jnp.abs(x)
    small = ax <= 0.5
    z = jnp.where(small, ax, jnp.sqrt(jnp.maximum((1.0 - ax) * 0.5, 1e-30)))
    s = _asin_poly(z)
    pos = jnp.where(small, jnp.pi / 2.0 - s, 2.0 * s)  # acos(|x|)
    return jnp.where(x >= 0, pos, jnp.pi - pos)


def make_shift_o(nt: int, o: int, in_kernel: bool):
    """Flat-order shift-by-``o`` on (NT, 128) channels: y[i] = x[i+o].

    Generalizes ``_make_shifts`` to arbitrary small offsets (|o| < 128) —
    the substrate for offset-pattern bonded terms and roll-based SHAKE
    (all-atom topologies put every bonded partner at a small static
    offset of its anchor when atoms are laid out [C H H (H)] per heavy
    group, data_io.build_pe_chain_allatom).  The wrap at the array ends
    is harmless: pattern params are zero there.
    """
    if o == 0:
        return lambda x: x
    if not in_kernel:
        def fn(x):
            return jnp.roll(x.reshape(-1), -o).reshape(x.shape)
        return fn
    if o > 0:
        def fn(x):
            xl = pltpu.roll(x, LANE - o, 1)
            xf = pltpu.roll(xl, nt - 1, 0) if nt > 1 else xl
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            return jnp.where(lane >= LANE - o, xf, xl)
    else:
        m = -o
        def fn(x):
            xr = pltpu.roll(x, m, 1)
            xb = pltpu.roll(xr, 1, 0) if nt > 1 else xr
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            return jnp.where(lane < m, xb, xr)
    return fn


def _make_shifts(nt: int, in_kernel: bool):
    """Global flat-order shift-by-one ops on (NT, 128) channel arrays.

    Atom order is flat tile-major; chains are consecutive atoms, so bonded
    neighbors are reachable by a lane roll plus a sublane fix at tile
    edges (validated on v5e).  The wrap at the very last slot is harmless:
    masks kill terms that cross chain (and hence padding) boundaries.
    """
    if in_kernel:
        def fwd(x):  # y[i] = x[i+1]
            xl = pltpu.roll(x, LANE - 1, 1)
            xf = pltpu.roll(xl, nt - 1, 0) if nt > 1 else xl
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            return jnp.where(lane == LANE - 1, xf, xl)

        def bwd(x):  # y[i] = x[i-1]
            xr = pltpu.roll(x, 1, 1)
            xb = pltpu.roll(xr, 1, 0) if nt > 1 else xr
            lane = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            return jnp.where(lane == 0, xb, xr)
    else:
        def fwd(x):
            return jnp.roll(x.reshape(-1), -1).reshape(x.shape)

        def bwd(x):
            return jnp.roll(x.reshape(-1), 1).reshape(x.shape)
    return fwd, bwd


def bonded_chain_forces(px, py, pz, rows, nt, sample, in_kernel,
                        use_poly_acos=True):
    """Per-atom bonded forces for chain topologies via flat shifts.

    rows: (16, NT, 128) topo channels (see _T_*).  Returns
    (fx, fy, fz, w6) with w6 the Voigt virial sum F (x) r (None unless
    ``sample``).  Shared verbatim between the Pallas kernel and the pure
    jnp test twin (``in_kernel`` switches the shift implementation).

    Physics: bond_style harmonic / angle_style harmonic / dihedral_style
    opls (lammps_scripts_opls/in.set.lammps) — hand-derived forces; the
    dihedral uses the Blondel-Karplus gradient with sin/cos multiples by
    Chebyshev recursion (no trig calls).
    """
    s1, sb = _make_shifts(nt, in_kernel)
    acos = _acos_poly if use_poly_acos else jnp.arccos
    dt = px.dtype
    tiny = jnp.asarray(1e-30, dt)

    bmask = rows[_T_BMASK] > 0.5
    amask = rows[_T_AMASK] > 0.5
    dmask = rows[_T_DMASK] > 0.5

    # bond vectors b_i = p_{i+1} - p_i (chains are never wrapped: the
    # engine keeps positions continuous and pack_topo unwraps data files)
    bx = s1(px) - px
    by = s1(py) - py
    bz = s1(pz) - pz
    r2b = bx * bx + by * by + bz * bz
    r2b_safe = jnp.where(bmask, r2b, 1.0)
    rb = jnp.sqrt(r2b_safe)

    # --- bonds: E = K (r - r0)^2
    fb = jnp.where(bmask, 2.0 * rows[_T_BK] * (rb - rows[_T_BR0]) / rb, 0.0)
    fx = fb * bx - sb(fb * bx)
    fy = fb * by - sb(fb * by)
    fz = fb * bz - sb(fb * bz)

    # --- angles: term i = (i, i+1, i+2); r1 = -b_i, r2 = b_{i+1}
    r2x, r2y, r2z = s1(bx), s1(by), s1(bz)
    d11 = jnp.where(amask, r2b, 1.0)
    d22 = jnp.where(amask, s1(r2b), 1.0)
    d12 = -(bx * r2x + by * r2y + bz * r2z)
    inv12 = jax.lax.rsqrt(d11 * d22)
    c = jnp.clip(d12 * inv12, -1.0 + 1e-7, 1.0 - 1e-7)
    th = acos(c)
    sin_th = jnp.sqrt(jnp.maximum(1.0 - c * c, tiny))
    aE = jnp.where(
        amask, -2.0 * rows[_T_AK] * (th - rows[_T_ATH0]) / sin_th, 0.0
    )
    # dc/dr1 = r2/(|r1||r2|) - c r1/|r1|^2 (r1 = -b, r2 = s1(b))
    g1x = r2x * inv12 - c * (-bx) / d11
    g1y = r2y * inv12 - c * (-by) / d11
    g1z = r2z * inv12 - c * (-bz) / d11
    g2x = -bx * inv12 - c * r2x / d22
    g2y = -by * inv12 - c * r2y / d22
    g2z = -bz * inv12 - c * r2z / d22
    # roles: F(atom i) = -aE g1; F(i+2) = -aE g2; F(i+1) = aE (g1 + g2)
    fx = fx - aE * g1x + sb(aE * (g1x + g2x)) - sb(sb(aE * g2x))
    fy = fy - aE * g1y + sb(aE * (g1y + g2y)) - sb(sb(aE * g2y))
    fz = fz - aE * g1z + sb(aE * (g1z + g2z)) - sb(sb(aE * g2z))

    # --- OPLS dihedrals: term i = (i..i+3); b1 = b_i, b2 = b_{i+1},
    # b3 = b_{i+2}
    b1x, b1y, b1z = bx, by, bz
    b2x, b2y, b2z = r2x, r2y, r2z
    b3x, b3y, b3z = s1(r2x), s1(r2y), s1(r2z)
    n1x = b1y * b2z - b1z * b2y
    n1y = b1z * b2x - b1x * b2z
    n1z = b1x * b2y - b1y * b2x
    n2x = b2y * b3z - b2z * b3y
    n2y = b2z * b3x - b2x * b3z
    n2z = b2x * b3y - b2y * b3x
    n1sq = jnp.where(dmask, n1x * n1x + n1y * n1y + n1z * n1z, 1.0)
    n2sq = jnp.where(dmask, n2x * n2x + n2y * n2y + n2z * n2z, 1.0)
    b2sq = jnp.where(dmask, b2x * b2x + b2y * b2y + b2z * b2z, 1.0)
    nb2 = jnp.sqrt(b2sq)
    inv_nn = jax.lax.rsqrt(n1sq * n2sq)
    cphi = (n1x * n2x + n1y * n2y + n1z * n2z) * inv_nn
    # signed sine: (n1 x n2).b2 / (|n1||n2||b2|)
    cxx = n1y * n2z - n1z * n2y
    cxy = n1z * n2x - n1x * n2z
    cxz = n1x * n2y - n1y * n2x
    sphi = (cxx * b2x + cxy * b2y + cxz * b2z) * inv_nn / nb2
    s_, c_ = sphi, cphi
    sin2 = 2.0 * s_ * c_
    sin3 = s_ * (3.0 - 4.0 * s_ * s_)
    cos2 = 1.0 - 2.0 * s_ * s_
    sin4 = 2.0 * sin2 * cos2
    K1, K2 = rows[_T_DK1], rows[_T_DK1 + 1]
    K3, K4 = rows[_T_DK1 + 2], rows[_T_DK1 + 3]
    dEdphi = 0.5 * (-K1 * s_ + 2.0 * K2 * sin2 - 3.0 * K3 * sin3
                    + 4.0 * K4 * sin4)
    dEdphi = jnp.where(dmask, dEdphi, 0.0)
    # Blondel-Karplus gradient
    c0 = nb2 / n1sq
    c3 = nb2 / n2sq
    dp0x, dp0y, dp0z = -c0 * n1x, -c0 * n1y, -c0 * n1z  # dphi/dr0
    dp3x, dp3y, dp3z = c3 * n2x, c3 * n2y, c3 * n2z     # dphi/dr3
    # dphi/db2 = -ts dphi/db1 - tu dphi/db3 (verified against autodiff),
    # so dp1 = -(1+ts) dp0 + tu dp3 and dp2 = ts dp0 - (1+tu) dp3
    ts = (b1x * b2x + b1y * b2y + b1z * b2z) / b2sq
    tu = (b3x * b2x + b3y * b2y + b3z * b2z) / b2sq
    dp1x = -(1.0 + ts) * dp0x + tu * dp3x
    dp1y = -(1.0 + ts) * dp0y + tu * dp3y
    dp1z = -(1.0 + ts) * dp0z + tu * dp3z
    dp2x = ts * dp0x - (1.0 + tu) * dp3x
    dp2y = ts * dp0y - (1.0 + tu) * dp3y
    dp2z = ts * dp0z - (1.0 + tu) * dp3z
    # F_k = -dE/dphi * dphi/dr_k ; accumulate role k via k backward shifts
    fx = fx - dEdphi * dp0x
    fy = fy - dEdphi * dp0y
    fz = fz - dEdphi * dp0z
    fx = fx - sb(dEdphi * dp1x)
    fy = fy - sb(dEdphi * dp1y)
    fz = fz - sb(dEdphi * dp1z)
    fx = fx - sb(sb(dEdphi * dp2x))
    fy = fy - sb(sb(dEdphi * dp2y))
    fz = fz - sb(sb(dEdphi * dp2z))
    fx = fx - sb(sb(sb(dEdphi * dp3x)))
    fy = fy - sb(sb(sb(dEdphi * dp3y)))
    fz = fz - sb(sb(sb(dEdphi * dp3z)))

    w6 = None
    if sample:
        # bonded virial = sum_i F_i (x) r_i (exact: every term's forces
        # sum to zero, so the origin drops out)
        w6 = (
            jnp.sum(fx * px), jnp.sum(fy * py), jnp.sum(fz * pz),
            0.5 * jnp.sum(fx * py + fy * px),
            0.5 * jnp.sum(fx * pz + fz * px),
            0.5 * jnp.sum(fy * pz + fz * py),
        )
    return fx, fy, fz, w6


# --------------------------------------------------------------------------
# Roll-based SHAKE/RATTLE: in-kernel bond constraints for offset-regular
# topologies (the reference's ``fix shake ... m 1.0`` — C-H bonds rigid,
# in.strain.lammps).  Exact twin of md/constraints.py's Jacobi sweeps
# with constraint partners reached by lane rolls.


def pack_shake(cons_idx, d0, n_atoms: int, dtype=jnp.float32,
               max_offset: int = 8):
    """Constraints -> (static offsets tuple, (n_off, NT, 128) d0^2 rows).

    Each constraint (i, j) must have j - i in a small static offset set
    (the [C H H (H)] layout guarantees offsets 1..3).  A zero d0^2 row
    entry disables the slot.
    """
    cons_idx = np.asarray(cons_idx)
    d0 = np.asarray(d0)
    npad = pad_n(n_atoms)
    NT = npad // LANE
    groups: dict[int, dict[int, float]] = {}
    for (i, j), d in zip(cons_idx, d0):
        a, b = (int(i), int(j)) if j > i else (int(j), int(i))
        o = b - a
        if o >= max_offset:
            raise ValueError(f"pack_shake: constraint offset {o} too large")
        g = groups.setdefault(o, {})
        if a in g:
            raise ValueError(f"pack_shake: duplicate constraint at {a}+{o}")
        g[a] = float(d)
    offsets = tuple(sorted(groups))
    rows = np.zeros((len(offsets), npad), dtype=np.float64)
    for k, o in enumerate(offsets):
        for a, d in groups[o].items():
            rows[k, a] = d * d
    return offsets, jnp.asarray(rows.reshape(len(offsets), NT, LANE),
                                dtype=dtype)


def shake_rolls(p, p_old, invm, offsets, rows, nt, in_kernel,
                n_iters: int = 20, relax: float = 0.8):
    """Jacobi SHAKE on (3 x (NT,128)) position channels; returns corrected
    positions.  ``invm`` may carry any constant factor (it cancels)."""
    shs = [(make_shift_o(nt, o, in_kernel), make_shift_o(nt, -o, in_kernel))
           for o in offsets]
    masks = [jnp.where(rows[k] > 0.0, 1.0, 0.0).astype(p[0].dtype)
             for k in range(len(offsets))]
    winv = [invm + sh(invm) for (sh, _) in shs]
    invm_j = [sh(invm) for (sh, _) in shs]
    old = [tuple(sh(c) - c for c in p_old) for (sh, _) in shs]

    def sweep(_, p):
        px, py, pz = p
        dx_acc = jnp.zeros_like(px)
        dy_acc = jnp.zeros_like(py)
        dz_acc = jnp.zeros_like(pz)
        for k, (sh, shb) in enumerate(shs):
            ox, oy, oz = old[k]
            rx = sh(px) - px
            ry = sh(py) - py
            rz = sh(pz) - pz
            diff = rx * rx + ry * ry + rz * rz - rows[k]
            denom = 2.0 * (rx * ox + ry * oy + rz * oz) * winv[k] + 1e-30
            g = masks[k] * relax * diff / denom
            cx, cy, cz = g * ox, g * oy, g * oz
            dx_acc += cx * invm - shb(cx * invm_j[k])
            dy_acc += cy * invm - shb(cy * invm_j[k])
            dz_acc += cz * invm - shb(cz * invm_j[k])
        return (px + dx_acc, py + dy_acc, pz + dz_acc)

    return jax.lax.fori_loop(0, n_iters, sweep, p)


def rattle_rolls(v, p, invm, offsets, rows, nt, in_kernel,
                 n_iters: int = 10, relax: float = 0.8):
    """Jacobi RATTLE: remove relative velocity along constrained bonds."""
    shs = [(make_shift_o(nt, o, in_kernel), make_shift_o(nt, -o, in_kernel))
           for o in offsets]
    masks = [jnp.where(rows[k] > 0.0, 1.0, 0.0).astype(v[0].dtype)
             for k in range(len(offsets))]
    winv = [invm + sh(invm) for (sh, _) in shs]
    invm_j = [sh(invm) for (sh, _) in shs]
    px, py, pz = p
    geo = []
    for k, (sh, _) in enumerate(shs):
        rx = sh(px) - px
        ry = sh(py) - py
        rz = sh(pz) - pz
        r2 = rx * rx + ry * ry + rz * rz
        geo.append((rx, ry, rz, r2))

    def sweep(_, v):
        vx, vy, vz = v
        dx_acc = jnp.zeros_like(vx)
        dy_acc = jnp.zeros_like(vy)
        dz_acc = jnp.zeros_like(vz)
        for k, (sh, shb) in enumerate(shs):
            rx, ry, rz, r2 = geo[k]
            dvx = sh(vx) - vx
            dvy = sh(vy) - vy
            dvz = sh(vz) - vz
            kk = masks[k] * relax * (dvx * rx + dvy * ry + dvz * rz) / (
                r2 * winv[k] + 1e-30)
            cx, cy, cz = kk * rx, kk * ry, kk * rz
            dx_acc += cx * invm - shb(cx * invm_j[k])
            dy_acc += cy * invm - shb(cy * invm_j[k])
            dz_acc += cz * invm - shb(cz * invm_j[k])
        return (vx + dx_acc, vy + dy_acc, vz + dz_acc)

    return jax.lax.fori_loop(0, n_iters, sweep, v)


# --------------------------------------------------------------------------
# Offset-pattern bonded terms: the general-topology in-kernel bonded path.
#
# Every bonded term is binned by its tuple of atom-index offsets from an
# anchor atom (bond (i, i+o); angle centered at i with partners i+oa,
# i+ob; dihedral (i, i+ob, i+oc, i+od)).  For each distinct pattern the
# kernel evaluates the term for ALL atoms at once with per-atom parameter
# rows (K = 0 disables), reaching partners by lane rolls — no gathers, no
# scatters.  Regular polymer topologies (the reference's polyethylene,
# lammps_scripts_opls) have ~40 patterns; irregular ones fall back to the
# XLA bonded path (pack_patterns raises).


def pack_patterns(topo, par, n_atoms: int, dtype=jnp.float32,
                  max_patterns: int = 64, max_offset: int = 32):
    """Topology -> (static pattern tuple, (R, NT, 128) parameter rows).

    patterns entries: ("bond", o) with rows [K, r0]; ("angle", oa, ob)
    with rows [K, th0]; ("dihedral", ob, oc, od) with rows [K1..K4].
    Raises ValueError for topologies that don't fit (impropers, too many
    patterns, offsets beyond the roll window).
    """
    if np.asarray(topo.impropers).shape[0]:
        raise ValueError("pack_patterns: impropers not supported")
    npad = pad_n(n_atoms)
    NT = npad // LANE

    groups: dict[tuple, dict[int, tuple]] = {}

    def add(key, anchor, params):
        g = groups.setdefault(key, {})
        if anchor in g:
            raise ValueError(f"pack_patterns: duplicate {key} at {anchor}")
        g[anchor] = params

    bk = np.asarray(par.bond_k)
    br0 = np.asarray(par.bond_r0)
    for (i, j), t in zip(np.asarray(topo.bonds), np.asarray(topo.bond_type)):
        if t < 0:
            continue
        a, b = (int(i), int(j)) if j > i else (int(j), int(i))
        add(("bond", b - a), a, (bk[t], br0[t]))
    ak = np.asarray(par.angle_k)
    ath = np.asarray(par.angle_theta0)
    for (i, j, k), t in zip(np.asarray(topo.angles),
                            np.asarray(topo.angle_type)):
        if t < 0:
            continue
        oa, ob = sorted((int(i) - int(j), int(k) - int(j)))
        add(("angle", oa, ob), int(j), (ak[t], ath[t]))
    dk = np.asarray(par.dihedral_k)
    for (a, b, c, d), t in zip(np.asarray(topo.dihedrals),
                               np.asarray(topo.dihedral_type)):
        if t < 0:
            continue
        a, b, c, d = int(a), int(b), int(c), int(d)
        add(("dihedral", b - a, c - a, d - a), a, tuple(dk[t]))

    if len(groups) > max_patterns:
        raise ValueError(
            f"pack_patterns: {len(groups)} patterns > {max_patterns} — "
            "irregular topology, use the XLA bonded path")
    for key in groups:
        if any(abs(o) >= max_offset for o in key[1:]):
            raise ValueError(f"pack_patterns: offset too large in {key}")

    patterns = tuple(sorted(groups.keys(), key=str))
    nrows = sum(2 if k[0] in ("bond", "angle") else 4 for k in patterns)
    rows = np.zeros((nrows, npad), dtype=np.float64)
    r = 0
    for key in patterns:
        width = 2 if key[0] in ("bond", "angle") else 4
        for anchor, params in groups[key].items():
            rows[r:r + width, anchor] = params
        r += width
    return patterns, jnp.asarray(rows.reshape(nrows, NT, LANE), dtype=dtype)


def bonded_pattern_forces(px, py, pz, rows, patterns, nt, sample,
                          in_kernel, use_poly_acos=True):
    """Per-atom bonded forces for offset-pattern topologies.

    Same physics as ``bonded_chain_forces`` (harmonic bonds/angles, OPLS
    dihedrals via the Blondel-Karplus gradient) but for arbitrary offset
    patterns.  Returns (fx, fy, fz, w6).
    """
    acos = _acos_poly if use_poly_acos else jnp.arccos
    dt = px.dtype
    tiny = jnp.asarray(1e-30, dt)
    shifts: dict[int, object] = {}

    def sh(o):
        if o not in shifts:
            shifts[o] = make_shift_o(nt, o, in_kernel)
        return shifts[o]

    def at(o):
        return sh(o)(px), sh(o)(py), sh(o)(pz)

    fx = jnp.zeros_like(px)
    fy = jnp.zeros_like(py)
    fz = jnp.zeros_like(pz)
    r = 0
    for key in patterns:
        kind = key[0]
        if kind == "bond":
            (o,) = key[1:]
            K, r0 = rows[r], rows[r + 1]
            r += 2
            mask = K > 0.0
            qx, qy, qz = at(o)
            bx, by, bz = qx - px, qy - py, qz - pz
            r2b = bx * bx + by * by + bz * bz
            rb = jnp.sqrt(jnp.where(mask, r2b, 1.0))
            fb = jnp.where(mask, 2.0 * K * (rb - r0) / rb, 0.0)
            gx, gy, gz = fb * bx, fb * by, fb * bz
            fx = fx + gx - sh(-o)(gx)
            fy = fy + gy - sh(-o)(gy)
            fz = fz + gz - sh(-o)(gz)
        elif kind == "angle":
            oa, ob = key[1:]
            K, th0 = rows[r], rows[r + 1]
            r += 2
            mask = K > 0.0
            ax, ay, az = at(oa)
            bx_, by_, bz_ = at(ob)
            r1x, r1y, r1z = ax - px, ay - py, az - pz
            r2x, r2y, r2z = bx_ - px, by_ - py, bz_ - pz
            d11 = jnp.where(mask, r1x * r1x + r1y * r1y + r1z * r1z, 1.0)
            d22 = jnp.where(mask, r2x * r2x + r2y * r2y + r2z * r2z, 1.0)
            d12 = r1x * r2x + r1y * r2y + r1z * r2z
            inv12 = jax.lax.rsqrt(d11 * d22)
            c = jnp.clip(d12 * inv12, -1.0 + 1e-7, 1.0 - 1e-7)
            th = acos(c)
            sin_th = jnp.sqrt(jnp.maximum(1.0 - c * c, tiny))
            aE = jnp.where(mask, -2.0 * K * (th - th0) / sin_th, 0.0)
            g1x = r2x * inv12 - c * r1x / d11
            g1y = r2y * inv12 - c * r1y / d11
            g1z = r2z * inv12 - c * r1z / d11
            g2x = r1x * inv12 - c * r2x / d22
            g2y = r1y * inv12 - c * r2y / d22
            g2z = r1z * inv12 - c * r2z / d22
            # F(center) = aE (g1 + g2); F(partner a) = -aE g1; similarly b
            fx = fx + aE * (g1x + g2x) - sh(-oa)(aE * g1x) - sh(-ob)(aE * g2x)
            fy = fy + aE * (g1y + g2y) - sh(-oa)(aE * g1y) - sh(-ob)(aE * g2y)
            fz = fz + aE * (g1z + g2z) - sh(-oa)(aE * g1z) - sh(-ob)(aE * g2z)
        else:  # dihedral (i, i+ob, i+oc, i+od)
            ob_, oc_, od_ = key[1:]
            K1, K2, K3, K4 = rows[r], rows[r + 1], rows[r + 2], rows[r + 3]
            r += 4
            mask = (jnp.abs(K1) + jnp.abs(K2) + jnp.abs(K3)
                    + jnp.abs(K4)) > 0.0
            p1x, p1y, p1z = at(ob_)
            p2x, p2y, p2z = at(oc_)
            p3x, p3y, p3z = at(od_)
            b1x, b1y, b1z = p1x - px, p1y - py, p1z - pz
            b2x, b2y, b2z = p2x - p1x, p2y - p1y, p2z - p1z
            b3x, b3y, b3z = p3x - p2x, p3y - p2y, p3z - p2z
            n1x = b1y * b2z - b1z * b2y
            n1y = b1z * b2x - b1x * b2z
            n1z = b1x * b2y - b1y * b2x
            n2x = b2y * b3z - b2z * b3y
            n2y = b2z * b3x - b2x * b3z
            n2z = b2x * b3y - b2y * b3x
            n1sq = jnp.where(mask, n1x * n1x + n1y * n1y + n1z * n1z, 1.0)
            n2sq = jnp.where(mask, n2x * n2x + n2y * n2y + n2z * n2z, 1.0)
            b2sq = jnp.where(mask, b2x * b2x + b2y * b2y + b2z * b2z, 1.0)
            nb2 = jnp.sqrt(b2sq)
            inv_nn = jax.lax.rsqrt(n1sq * n2sq)
            cphi = (n1x * n2x + n1y * n2y + n1z * n2z) * inv_nn
            cxx = n1y * n2z - n1z * n2y
            cxy = n1z * n2x - n1x * n2z
            cxz = n1x * n2y - n1y * n2x
            sphi = (cxx * b2x + cxy * b2y + cxz * b2z) * inv_nn / nb2
            s_, c_ = sphi, cphi
            sin2 = 2.0 * s_ * c_
            sin3 = s_ * (3.0 - 4.0 * s_ * s_)
            cos2 = 1.0 - 2.0 * s_ * s_
            sin4 = 2.0 * sin2 * cos2
            dEdphi = 0.5 * (-K1 * s_ + 2.0 * K2 * sin2 - 3.0 * K3 * sin3
                            + 4.0 * K4 * sin4)
            dEdphi = jnp.where(mask, dEdphi, 0.0)
            c0 = nb2 / n1sq
            c3 = nb2 / n2sq
            dp0x, dp0y, dp0z = -c0 * n1x, -c0 * n1y, -c0 * n1z
            dp3x, dp3y, dp3z = c3 * n2x, c3 * n2y, c3 * n2z
            ts = (b1x * b2x + b1y * b2y + b1z * b2z) / b2sq
            tu = (b3x * b2x + b3y * b2y + b3z * b2z) / b2sq
            dp1x = -(1.0 + ts) * dp0x + tu * dp3x
            dp1y = -(1.0 + ts) * dp0y + tu * dp3y
            dp1z = -(1.0 + ts) * dp0z + tu * dp3z
            dp2x = ts * dp0x - (1.0 + tu) * dp3x
            dp2y = ts * dp0y - (1.0 + tu) * dp3y
            dp2z = ts * dp0z - (1.0 + tu) * dp3z
            fx = fx - dEdphi * dp0x - sh(-ob_)(dEdphi * dp1x) \
                - sh(-oc_)(dEdphi * dp2x) - sh(-od_)(dEdphi * dp3x)
            fy = fy - dEdphi * dp0y - sh(-ob_)(dEdphi * dp1y) \
                - sh(-oc_)(dEdphi * dp2y) - sh(-od_)(dEdphi * dp3y)
            fz = fz - dEdphi * dp0z - sh(-ob_)(dEdphi * dp1z) \
                - sh(-oc_)(dEdphi * dp2z) - sh(-od_)(dEdphi * dp3z)

    w6 = None
    if sample:
        w6 = (
            jnp.sum(fx * px), jnp.sum(fy * py), jnp.sum(fz * pz),
            0.5 * jnp.sum(fx * py + fy * px),
            0.5 * jnp.sum(fx * pz + fz * px),
            0.5 * jnp.sum(fy * pz + fz * py),
        )
    return fx, fy, fz, w6


def _hcols(h6):
    """Upper-tri h scalars -> column vectors (lx..), ((xy,ly)..), etc."""
    lx, ly, lz, xy, xz, yz = (h6[i] for i in range(6))
    return lx, ly, lz, xy, xz, yz


def _h_at(h0, eps, frac):
    """deform_path on scalars: lengths scale, tilts shift (box.deform_path)."""
    lx0, ly0, lz0, xy0, xz0, yz0 = _hcols(h0)
    exx, eyy, ezz, exy, exz, eyz = (eps[i] for i in range(6))
    lx = lx0 * (1.0 + frac * exx)
    ly = ly0 * (1.0 + frac * eyy)
    lz = lz0 * (1.0 + frac * ezz)
    xy = xy0 + frac * exy * ly0
    xz = xz0 + frac * exz * lz0
    yz = yz0 + frac * eyz * lz0
    return (lx, ly, lz, xy, xz, yz)


def _remap_coeffs(h_old, h_new):
    """Upper-tri A = h_new @ inv(h_old) scalars for the affine remap."""
    lx, ly, lz, xy, xz, yz = h_old
    nlx, nly, nlz, nxy, nxz, nyz = h_new
    # inverse of upper-tri h_old
    i00 = 1.0 / lx
    i11 = 1.0 / ly
    i22 = 1.0 / lz
    i01 = -xy / (lx * ly)
    i12 = -yz / (ly * lz)
    i02 = (xy * yz - xz * ly) / (lx * ly * lz)
    a00 = nlx * i00
    a01 = nlx * i01 + nxy * i11
    a02 = nlx * i02 + nxy * i12 + nxz * i22
    a11 = nly * i11
    a12 = nly * i12 + nyz * i22
    a22 = nlz * i22
    return a00, a01, a02, a11, a12, a22


def _make_kernel(spec: FusedSpec, deform: bool, sample: bool, thermostat: bool):
    NT, K = spec.nt, spec.k
    P = NT  # gather passes (full-table window)
    kb, ftm2v, nktv2p = spec.boltz, spec.ftm2v, spec.nktv2p
    # the erfc real-space form is wired into BOTH pair loops (all-pairs
    # tile blocks and the gather list path) — kspace systems above the
    # all-pairs VMEM gate run the list kernel with the same split

    def gather3(px, py, pz, idx_t):
        """Gather 3 position channels for one center tile's slot indices."""
        kk = idx_t.shape[0]  # K resident, or k_chunk streamed
        gx = jnp.zeros((kk, LANE), px.dtype)
        gy = jnp.zeros((kk, LANE), px.dtype)
        gz = jnp.zeros((kk, LANE), px.dtype)
        tile_of = idx_t >> 7
        lane_of = jnp.bitwise_and(idx_t, LANE - 1)
        for p in range(P):
            sel = tile_of == p
            gx = jnp.where(sel, jnp.take_along_axis(
                jnp.broadcast_to(px[p][None, :], (kk, LANE)), lane_of, axis=1), gx)
            gy = jnp.where(sel, jnp.take_along_axis(
                jnp.broadcast_to(py[p][None, :], (kk, LANE)), lane_of, axis=1), gy)
            gz = jnp.where(sel, jnp.take_along_axis(
                jnp.broadcast_to(pz[p][None, :], (kk, LANE)), lane_of, axis=1), gz)
        return gx, gy, gz

    def kernel(iscal_ref, fscal_ref, state_ref, idx_ref, w4e_ref, sig2_ref,
               imx_ref, imy_ref, imz_ref, qq_ref, topo_ref, pat_ref,
               shk_ref, fxt_ref, state_out, sacc_ref, *scratch):
        # job-grid program index, hoisted to kernel top level: inside a
        # fori_loop body program_id has no interpret-mode lowering, and
        # closing over the top-level value works on both paths
        jb0 = pl.program_id(0) if spec.batch_grid else None
        dtype = state_ref.dtype
        # J jobs share one program (spec.jobs > 1 fills the machine's ILP
        # slack with independent block chains; measured +16% at J=2 on
        # v5e).  Every run parameter is per-job: iscal/fscal carry J rows,
        # the state/scratch stack J tile groups, sacc returns J rows.
        J = spec.jobs
        NPAD = NT * LANE
        # scalar row index: SMEM windows are FULL (B*J, _) under the job
        # grid (TPU SMEM blocks can't tile rows), so job jb0 reads its
        # own row by dynamic index
        srow = (lambda j: j) if jb0 is None else (lambda j: jb0 * J + j)
        n_run = [iscal_ref[srow(j), _I_NRUN] for j in range(J)]
        gstep0 = [iscal_ref[srow(j), _I_GSTEP0] for j in range(J)]
        n_tot = [iscal_ref[srow(j), _I_NTOT] for j in range(J)]
        dt = [fscal_ref[srow(j), _F_DT] for j in range(J)]
        T = fscal_ref[srow(0), _F_T]
        h0 = [tuple(fscal_ref[srow(j), _F_H0 + i] for i in range(6))
              for j in range(J)]
        eps = [tuple(fscal_ref[srow(j), _F_EPS + i] for i in range(6))
               for j in range(J)]
        jsl = [slice(j * NT, (j + 1) * NT) for j in range(J)]
        invm = [state_ref[0, 6, jsl[j]] for j in range(J)]  # ftm2v/m
        mftm = [state_ref[0, 7, jsl[j]] for j in range(J)]  # m/ftm2v

        def h_of(g, j=0):
            if not deform:
                return h0[j]
            frac = g.astype(dtype) / n_tot[j].astype(dtype)
            return _h_at(h0[j], eps[j], frac)

        def forces_allpairs_sw(px, py, pz, h6):
            """Stillinger-Weber all-pairs tile-pair forces.

            Sweep 1 accumulates the per-atom three-body moments
            (s = sum g, g^2, m = sum g u, Q = sum g u (x) u) as lane
            vectors; the SW three-body energy is a quadratic form in
            those, so its gradient needs only the per-atom adjoints
            A_s, A_gsq, A_m, A_Q (sw_pallas.sw_forces_pallas_bricks).
            Sweep 2 evaluates the ordered-pair w = dT/dd twice per block
            (center = lane with lane adjoints; center = row with
            transposed adjoints) — both roles reduce over rows onto the
            lane tile, so no lane-axis reductions appear anywhere.
            """
            eps_, sig, a_cut, lam, gam, c0, A_, B_ = spec.sw_params
            rc = a_cut * sig
            lam_eps = lam * eps_
            lx, ly, lz, xy, xz, yz = h6
            inv_lx, inv_ly, inv_lz = 1.0 / lx, 1.0 / ly, 1.0 / lz
            # float occupancy (padded atoms have a zero invm row) — kept
            # multiplicative rather than in the mask: Mosaic rejects
            # sublane reductions whose mask layout mixes broadcast offsets
            occf = jnp.where(invm[0] > 0.0, jnp.asarray(1.0, dtype),
                             jnp.asarray(0.0, dtype))
            cols = [
                (
                    jnp.swapaxes(px[u].reshape(1, LANE), 0, 1),
                    jnp.swapaxes(py[u].reshape(1, LANE), 0, 1),
                    jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1),
                    jnp.swapaxes(occf[u].reshape(1, LANE), 0, 1),
                )
                for u in range(NT)
            ]
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
            cols_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
            eye = rows_i == cols_i

            def block_geom(t, u):
                """Shared pair geometry for (rows = tile u, lanes = tile t):
                d = r_row - r_lane (neighbor - center for role A).
                ``occp`` is the float pair-occupancy multiplier."""
                xj, yj, zj, oj = cols[u]
                dx = xj - px[t].reshape(1, LANE)
                dy = yj - py[t].reshape(1, LANE)
                dz = zj - pz[t].reshape(1, LANE)
                n3 = jnp.round(dz * inv_lz)
                dz = dz - n3 * lz
                dy = dy - n3 * yz
                n2 = jnp.round(dy * inv_ly)
                dy = dy - n2 * ly
                dx = dx - n3 * xz - n2 * xy
                n1 = jnp.round(dx * inv_lx)
                dx = dx - n1 * lx
                r2 = dx * dx + dy * dy + dz * dz
                mask = (r2 < (rc - 1e-6) ** 2) & (r2 > 1e-8)
                if t == u:
                    mask = mask & ~eye
                occp = oj * occf[t].reshape(1, LANE)
                r = jnp.sqrt(jnp.where(mask, r2, 1.0))
                inv_r = 1.0 / r
                return dx, dy, dz, r, inv_r, mask, occp

            # ---- sweep 1: moments per lane tile
            mom = []  # per tile: (s, gsq, mx, my, mz, Qxx..Qyz) lane rows
            for t in range(NT):
                acc = [jnp.zeros((1, LANE), dtype) for _ in range(11)]
                for u in range(NT):
                    dx, dy, dz, r, inv_r, mask, occp = block_geom(t, u)
                    g = occp * jnp.where(
                        mask,
                        jnp.exp(gam * sig / jnp.where(mask, r - rc, -1.0)),
                        0.0)
                    ux, uy, uz = dx * inv_r, dy * inv_r, dz * inv_r
                    acc[0] += jnp.sum(g, axis=0, keepdims=True)
                    acc[1] += jnp.sum(g * g, axis=0, keepdims=True)
                    acc[2] += jnp.sum(g * ux, axis=0, keepdims=True)
                    acc[3] += jnp.sum(g * uy, axis=0, keepdims=True)
                    acc[4] += jnp.sum(g * uz, axis=0, keepdims=True)
                    acc[5] += jnp.sum(g * ux * ux, axis=0, keepdims=True)
                    acc[6] += jnp.sum(g * uy * uy, axis=0, keepdims=True)
                    acc[7] += jnp.sum(g * uz * uz, axis=0, keepdims=True)
                    acc[8] += jnp.sum(g * ux * uy, axis=0, keepdims=True)
                    acc[9] += jnp.sum(g * ux * uz, axis=0, keepdims=True)
                    acc[10] += jnp.sum(g * uy * uz, axis=0, keepdims=True)
                mom.append(acc)

            # ---- adjoints per tile (lane rows), plus transposed columns
            adj_lane, adj_col = [], []
            for t in range(NT):
                s_, gsq, mx, my, mz, qxx, qyy, qzz, qxy, qxz, qyz = mom[t]
                a_s = lam_eps * c0 * c0 * s_
                a_gsq = jnp.full((1, LANE),
                                 -(lam_eps / 2.0) * (1.0 - c0) ** 2, dtype)
                amx = -2.0 * lam_eps * c0 * mx
                amy = -2.0 * lam_eps * c0 * my
                amz = -2.0 * lam_eps * c0 * mz
                rowset = (a_s, a_gsq, amx, amy, amz,
                          lam_eps * qxx, lam_eps * qyy, lam_eps * qzz,
                          lam_eps * qxy, lam_eps * qxz, lam_eps * qyz)
                adj_lane.append(rowset)
                adj_col.append(tuple(jnp.swapaxes(x, 0, 1) for x in rowset))

            def w_of(ux, uy, uz, inv_r, g, dg, radial0, adj):
                """w = dT/dd for centers whose adjoints are ``adj``
                (broadcastable against the (128, 128) block)."""
                (a_s, a_gsq, amx, amy, amz,
                 qxx, qyy, qzz, qxy, qxz, qyz) = adj
                am_u = amx * ux + amy * uy + amz * uz
                qu_x = qxx * ux + qxy * uy + qxz * uz
                qu_y = qxy * ux + qyy * uy + qyz * uz
                qu_z = qxz * ux + qyz * uy + qzz * uz
                uqu = ux * qu_x + uy * qu_y + uz * qu_z
                radial = radial0 + dg * (a_s + 2.0 * a_gsq * g + am_u + uqu)
                tang = g * inv_r
                wx = radial * ux + tang * (amx + 2.0 * qu_x
                                           - (am_u + 2.0 * uqu) * ux)
                wy = radial * uy + tang * (amy + 2.0 * qu_y
                                           - (am_u + 2.0 * uqu) * uy)
                wz = radial * uz + tang * (amz + 2.0 * qu_z
                                           - (am_u + 2.0 * uqu) * uz)
                return wx, wy, wz

            # ---- sweep 2: forces (+ virial on role A's ordered pairs)
            fxs, fys, fzs = [], [], []
            w6 = [jnp.zeros((), dtype) for _ in range(6)]
            for t in range(NT):
                fx_t = jnp.zeros((1, LANE), dtype)
                fy_t = jnp.zeros((1, LANE), dtype)
                fz_t = jnp.zeros((1, LANE), dtype)
                for u in range(NT):
                    dx, dy, dz, r, inv_r, mask, occp = block_geom(t, u)
                    ux, uy, uz = dx * inv_r, dy * inv_r, dz * inv_r
                    denom = jnp.where(mask, r - rc, -1.0)
                    expo = jnp.exp(sig / denom)
                    sr2 = (sig * inv_r) ** 2
                    srp = sr2 * sr2  # p = 4
                    phi2 = A_ * eps_ * (B_ * srp - 1.0) * expo  # q = 0
                    dphi2 = (A_ * eps_ * (-4.0 * B_ * srp * inv_r) * expo
                             + phi2 * (-sig / (denom * denom)))
                    g = jnp.where(mask, jnp.exp(gam * sig / denom), 0.0)
                    dg = g * (-gam * sig / (denom * denom))
                    radial0 = 0.5 * dphi2
                    occm = jnp.where(mask, occp, 0.0)

                    # role A: centers = lanes of t, neighbors = rows
                    wax, way, waz = w_of(ux, uy, uz, inv_r, g, dg, radial0,
                                         adj_lane[t])
                    wax = occm * wax
                    way = occm * way
                    waz = occm * waz
                    fx_t = fx_t + jnp.sum(wax, axis=0, keepdims=True)
                    fy_t = fy_t + jnp.sum(way, axis=0, keepdims=True)
                    fz_t = fz_t + jnp.sum(waz, axis=0, keepdims=True)
                    # role B: centers = rows of u (transposed adjoints),
                    # lane atoms are the neighbors: reaction on lanes
                    wbx, wby, wbz = w_of(-ux, -uy, -uz, inv_r, g, dg,
                                         radial0, adj_col[u])
                    fx_t = fx_t - jnp.sum(occm * wbx, axis=0, keepdims=True)
                    fy_t = fy_t - jnp.sum(occm * wby, axis=0, keepdims=True)
                    fz_t = fz_t - jnp.sum(occm * wbz, axis=0, keepdims=True)
                    if sample:
                        # ordered pairs of role A enumerate every ordered
                        # pair once; engine convention W = -sym(sum w x d)
                        w6[0] -= jnp.sum(wax * dx)
                        w6[1] -= jnp.sum(way * dy)
                        w6[2] -= jnp.sum(waz * dz)
                        w6[3] -= 0.5 * jnp.sum(wax * dy + way * dx)
                        w6[4] -= 0.5 * jnp.sum(wax * dz + waz * dx)
                        w6[5] -= 0.5 * jnp.sum(way * dz + waz * dy)
                fxs.append(fx_t.reshape(LANE))
                fys.append(fy_t.reshape(LANE))
                fzs.append(fz_t.reshape(LANE))
            return (jnp.stack(fxs), jnp.stack(fys), jnp.stack(fzs), w6)

        def _tri_sl(t, u):
            """Index of upper-triangle block (t, u) in a parameter plane:
            a packed row-block (tri_packed, the default) or the dense
            2-D tile (the round-3 hardware-proven fallback layout)."""
            if spec.tri_packed:
                b = tri_blk(t, u, NT)
                return slice(b * LANE, (b + 1) * LANE)
            return (slice(u * LANE, (u + 1) * LANE),
                    slice(t * LANE, (t + 1) * LANE))

        def _img_sl(t, u, j):
            """Same, for job j's min-image cache planes."""
            if spec.tri_packed:
                b = j * tri_nblk(NT) + tri_blk(t, u, NT)
                return slice(b * LANE, (b + 1) * LANE)
            return (slice(j * NPAD + u * LANE, j * NPAD + (u + 1) * LANE),
                    slice(t * LANE, (t + 1) * LANE))

        def refresh_images(px, py, pz, h6, j=0):
            """Recompute min-image integers into VMEM scratch (upper block
            triangle only — forces never read u < t; stored triangle-
            PACKED, see tri_blk, in bf16 when spec.img_bf16 — small
            integers are exact there).  Sequential upper-triangular
            rounding, sign-flipped so the force path can reconstruct
            shifts with pure FMAs: d = (r_u - r_t) + n . h.  Job j's
            blocks start at packed row-block j * NBLK."""
            lx, ly, lz, xy, xz, yz = h6
            inv_lx, inv_ly, inv_lz = 1.0 / lx, 1.0 / ly, 1.0 / lz
            n1_s, n2_s, n3_s = scratch
            for t in range(NT):
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                for u in range(t, NT):
                    xj = jnp.swapaxes(px[u].reshape(1, LANE), 0, 1)
                    yj = jnp.swapaxes(py[u].reshape(1, LANE), 0, 1)
                    zj = jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1)
                    dx = xj - xi
                    dy = yj - yi
                    dz = zj - zi
                    n3 = -jnp.round(dz * inv_lz)
                    dz = dz + n3 * lz
                    dy = dy + n3 * yz
                    n2 = -jnp.round(dy * inv_ly)
                    dy = dy + n2 * ly
                    dx = dx + n3 * xz + n2 * xy
                    n1 = -jnp.round(dx * inv_lx)
                    sl = _img_sl(t, u, j)
                    n1_s[sl] = n1.astype(n1_s.dtype)
                    n2_s[sl] = n2.astype(n2_s.dtype)
                    n3_s[sl] = n3.astype(n3_s.dtype)

        def forces_allpairs(px, py, pz, h6, j=0):
            """Tile-pair all-pairs forces: dense (128, 128) blocks, zero
            gathers, Newton-halved.  Block layout [s, l] = pair
            (j = u*128+s source rows, i = t*128+l target lanes); parameter
            matrices are symmetric and only u >= t blocks are read, so
            they arrive triangle-PACKED as (NBLK*128, 128) (pack_tri_plane
            — 43% less VMEM than the dense planes).  Min-image shifts come
            from the (equally packed, bf16) VMEM integer cache (see
            FusedSpec.img_refresh — exact, not approximate); the reaction
            on tile u is accumulated through a (128,128) transpose (XLU,
            concurrent with the VPU pair math).  Pair force uses the
            LAMMPS lj1/lj2 coefficient form: F/r = (lj1 u^3 - lj2) u^4
            with u = 1/r^2 — 5 vector ops against 7 for the
            sigma^2-power form."""
            lx, ly, lz, xy, xz, yz = h6
            n1_s, n2_s, n3_s = scratch
            # one transpose per source tile per step: lane row -> sublane col
            cols = [
                (
                    jnp.swapaxes(px[u].reshape(1, LANE), 0, 1),
                    jnp.swapaxes(py[u].reshape(1, LANE), 0, 1),
                    jnp.swapaxes(pz[u].reshape(1, LANE), 0, 1),
                )
                for u in range(NT)
            ]
            acc = [[jnp.zeros((LANE, LANE), dtype) for _ in range(3)]
                   for _ in range(NT)]
            w6 = [jnp.zeros((), dtype) for _ in range(6)]
            for t in range(NT):
                xi = px[t].reshape(1, LANE)
                yi = py[t].reshape(1, LANE)
                zi = pz[t].reshape(1, LANE)
                for u in range(t, NT):
                    xj, yj, zj = cols[u]
                    sl = _tri_sl(t, u)
                    slj = _img_sl(t, u, j)
                    lj1 = w4e_ref[0][sl]
                    lj2 = sig2_ref[0][sl]
                    n1 = n1_s[slj].astype(dtype)
                    n2 = n2_s[slj].astype(dtype)
                    n3 = n3_s[slj].astype(dtype)
                    dx = xj - xi + n1 * lx + n2 * xy + n3 * xz
                    dy = yj - yi + n2 * ly + n3 * yz
                    dz = zj - zi + n3 * lz
                    r2 = dx * dx + dy * dy + dz * dz
                    # single-compare trim: no low-side live test — overlap
                    # pairs are force-clamped at r2min (the XLA LJ path's
                    # clamp semantics), self/excluded pairs have lj1 = 0
                    live = r2 < spec.cutoff2
                    r2c = jnp.maximum(r2, spec.r2min)
                    if spec.coul:
                        inv_r = jax.lax.rsqrt(r2c)
                        inv_r2 = inv_r * inv_r
                    else:
                        inv_r2 = 1.0 / r2c
                    u2 = inv_r2 * inv_r2
                    u3 = u2 * inv_r2
                    fpair = jnp.where(live, (lj1 * u3 - lj2) * u2 * u2, 0.0)
                    if spec.coul:
                        qq = qq_ref[0][sl]
                        if spec.ewald_alpha > 0.0:
                            fcoul = _ewald_fcoul(qq, r2c, inv_r, inv_r2,
                                                 spec.ewald_alpha)
                        else:
                            fcoul = qq * inv_r * inv_r2
                        fpair = fpair + jnp.where(
                            r2 < spec.coul_cutoff2, fcoul, 0.0)
                    wx = fpair * dx
                    wy = fpair * dy
                    wz = fpair * dz
                    if spec.pair_bf16:
                        # one downcast serves action AND reaction (Newton-
                        # exact); the XLU transpose below runs on half the
                        # bytes.  Accumulators stay f32.
                        wx = wx.astype(jnp.bfloat16)
                        wy = wy.astype(jnp.bfloat16)
                        wz = wz.astype(jnp.bfloat16)
                    acc[t][0] = acc[t][0] - wx.astype(dtype)
                    acc[t][1] = acc[t][1] - wy.astype(dtype)
                    acc[t][2] = acc[t][2] - wz.astype(dtype)
                    if u > t:
                        acc[u][0] = acc[u][0] + jnp.swapaxes(
                            wx, 0, 1).astype(dtype)
                        acc[u][1] = acc[u][1] + jnp.swapaxes(
                            wy, 0, 1).astype(dtype)
                        acc[u][2] = acc[u][2] + jnp.swapaxes(
                            wz, 0, 1).astype(dtype)
                    if sample:
                        # u > t blocks see each unordered pair once (full
                        # weight); the diagonal block sees both orders
                        wgt = 1.0 if u > t else 0.5
                        w6[0] += wgt * jnp.sum(wx * dx)
                        w6[1] += wgt * jnp.sum(wy * dy)
                        w6[2] += wgt * jnp.sum(wz * dz)
                        w6[3] += wgt * jnp.sum(wx * dy)
                        w6[4] += wgt * jnp.sum(wx * dz)
                        w6[5] += wgt * jnp.sum(wy * dz)
            fx = jnp.stack([jnp.sum(acc[t][0], axis=0) for t in range(NT)])
            fy = jnp.stack([jnp.sum(acc[t][1], axis=0) for t in range(NT)])
            fz = jnp.stack([jnp.sum(acc[t][2], axis=0) for t in range(NT)])
            if spec.bonded:
                rows = topo_ref[0]
                bfx, bfy, bfz, bw6 = bonded_chain_forces(
                    px, py, pz, rows, NT, sample, in_kernel=not spec.interpret,
                    use_poly_acos=not spec.interpret,
                )
                fx, fy, fz = fx + bfx, fy + bfy, fz + bfz
                if sample:
                    w6 = [w6[i] + bw6[i] for i in range(6)]
            if spec.bonded_pattern:
                bfx, bfy, bfz, bw6 = bonded_pattern_forces(
                    px, py, pz, pat_ref[0], spec.bonded_pattern, NT, sample,
                    in_kernel=not spec.interpret,
                    use_poly_acos=not spec.interpret,
                )
                fx, fy, fz = fx + bfx, fy + bfy, fz + bfz
                if sample:
                    w6 = [w6[i] + bw6[i] for i in range(6)]
            if spec.fext:
                # frozen kspace forces (rRESPA outer level); their virial
                # is accumulated host-side per chunk, not here
                fx = fx + fxt_ref[0, 0, j * NT:(j + 1) * NT]
                fy = fy + fxt_ref[0, 1, j * NT:(j + 1) * NT]
                fz = fz + fxt_ref[0, 2, j * NT:(j + 1) * NT]
            return fx, fy, fz, w6

        def forces(px, py, pz, h6, j=0):
            """Pair forces + (optionally) per-step pair virial (Voigt-6)."""
            if spec.sw:
                return forces_allpairs_sw(px, py, pz, h6)
            if spec.allpairs:
                return forces_allpairs(px, py, pz, h6, j=j)
            lx, ly, lz, xy, xz, yz = h6

            def pair_tile(t, idx_t, w4e, sig2, nx, ny, nz, qq, w6):
                """Pair forces on center tile t from one slot window —
                the full (K,) column set resident, or one streamed
                k_chunk of it."""
                gx, gy, gz = gather3(px, py, pz, idx_t)
                dx = gx - px[t][None, :] + nx * lx + ny * xy + nz * xz
                dy = gy - py[t][None, :] + ny * ly + nz * yz
                dz = gz - pz[t][None, :] + nz * lz
                r2 = dx * dx + dy * dy + dz * dz
                live = (r2 < spec.cutoff2) & (r2 > spec.r2min)
                r2c = jnp.maximum(r2, spec.r2min)
                inv_r2 = 1.0 / r2c
                s2 = sig2 * inv_r2
                s6 = s2 * s2 * s2
                fpair = jnp.where(
                    live, 6.0 * w4e * (2.0 * s6 * s6 - s6) * inv_r2, 0.0
                )
                if spec.coul:
                    livec = (r2 < spec.coul_cutoff2) & (r2 > spec.r2min)
                    inv_r = jax.lax.rsqrt(r2c)
                    if spec.ewald_alpha > 0.0:
                        fcoul = _ewald_fcoul(qq, r2c, inv_r, inv_r2,
                                             spec.ewald_alpha)
                    else:
                        fcoul = qq * inv_r * inv_r2
                    fpair = fpair + jnp.where(livec, fcoul, 0.0)
                tfx = -jnp.sum(fpair * dx, axis=0)
                tfy = -jnp.sum(fpair * dy, axis=0)
                tfz = -jnp.sum(fpair * dz, axis=0)
                if sample:
                    # pair virial sum w (x) d; full list double-counts -> 0.5
                    w6 = [
                        w6[0] + 0.5 * jnp.sum(fpair * dx * dx),
                        w6[1] + 0.5 * jnp.sum(fpair * dy * dy),
                        w6[2] + 0.5 * jnp.sum(fpair * dz * dz),
                        w6[3] + 0.5 * jnp.sum(fpair * dx * dy),
                        w6[4] + 0.5 * jnp.sum(fpair * dx * dz),
                        w6[5] + 0.5 * jnp.sum(fpair * dy * dz),
                    ]
                return tfx, tfy, tfz, w6

            w6 = [jnp.zeros((), dtype) for _ in range(6)]
            if spec.k_chunk:
                # HBM-streamed channels: double-buffered K-chunk DMAs
                # (guide "Patterns: Double Buffering"); the channel refs
                # are memory_space=ANY and never read directly.
                KC = spec.k_chunk
                NKC = K // KC
                n_stream = 7 if spec.coul else 6
                bufs = scratch[:n_stream]
                sems = scratch[n_stream]
                hbm = [idx_ref, w4e_ref, sig2_ref, imx_ref, imy_ref,
                       imz_ref] + ([qq_ref] if spec.coul else [])
                if spec.batch_grid:
                    # grid over jobs: channels carry a leading B axis;
                    # this program streams its own job's slice (jb0 is
                    # the top-level program_id, closed over)
                    def get_dma(i, slot, c):
                        return pltpu.make_async_copy(
                            hbm[i].at[jb0, 0, pl.ds(c * KC, KC)],
                            bufs[i].at[slot], sems.at[slot, i])
                else:
                    def get_dma(i, slot, c):
                        return pltpu.make_async_copy(
                            hbm[i].at[0, pl.ds(c * KC, KC)],
                            bufs[i].at[slot], sems.at[slot, i])

                def start_all(slot, c):
                    for i in range(n_stream):
                        get_dma(i, slot, c).start()

                def wait_all(slot, c):
                    for i in range(n_stream):
                        get_dma(i, slot, c).wait()

                start_all(0, 0)
                zero = jnp.zeros((NT, LANE), dtype)

                def kc_body(c, carry):
                    fxc, fyc, fzc = carry[:3]
                    w6c = list(carry[3:])
                    slot = jax.lax.rem(c, 2)

                    @pl.when(c + 1 < NKC)
                    def _():
                        start_all(1 - slot, c + 1)

                    wait_all(slot, c)
                    pfx, pfy, pfz = [], [], []
                    for t in range(NT):
                        qq = bufs[6][slot, :, t, :] if spec.coul else None
                        tfx, tfy, tfz, w6c = pair_tile(
                            t, bufs[0][slot, :, t, :],
                            bufs[1][slot, :, t, :], bufs[2][slot, :, t, :],
                            bufs[3][slot, :, t, :], bufs[4][slot, :, t, :],
                            bufs[5][slot, :, t, :], qq, w6c)
                        pfx.append(tfx)
                        pfy.append(tfy)
                        pfz.append(tfz)
                    return (fxc + jnp.stack(pfx), fyc + jnp.stack(pfy),
                            fzc + jnp.stack(pfz), *w6c)

                out = jax.lax.fori_loop(
                    0, NKC, kc_body, (zero, zero, zero, *w6))
                fx, fy, fz = out[:3]
                w6 = list(out[3:])
            else:
                fxs, fys, fzs = [], [], []
                for t in range(NT):
                    qq = qq_ref[0, :, t, :] if spec.coul else None
                    tfx, tfy, tfz, w6 = pair_tile(
                        t, idx_ref[0, :, t, :], w4e_ref[0, :, t, :],
                        sig2_ref[0, :, t, :], imx_ref[0, :, t, :],
                        imy_ref[0, :, t, :], imz_ref[0, :, t, :], qq, w6)
                    fxs.append(tfx)
                    fys.append(tfy)
                    fzs.append(tfz)
                fx, fy, fz = jnp.stack(fxs), jnp.stack(fys), jnp.stack(fzs)
            if spec.bonded:
                rows = topo_ref[0]
                bfx, bfy, bfz, bw6 = bonded_chain_forces(
                    px, py, pz, rows, NT, sample, in_kernel=not spec.interpret,
                    use_poly_acos=not spec.interpret,
                )
                fx, fy, fz = fx + bfx, fy + bfy, fz + bfz
                if sample:
                    w6 = [w6[i] + bw6[i] for i in range(6)]
            if spec.bonded_pattern:
                bfx, bfy, bfz, bw6 = bonded_pattern_forces(
                    px, py, pz, pat_ref[0], spec.bonded_pattern, NT, sample,
                    in_kernel=not spec.interpret,
                    use_poly_acos=not spec.interpret,
                )
                fx, fy, fz = fx + bfx, fy + bfy, fz + bfz
                if sample:
                    w6 = [w6[i] + bw6[i] for i in range(6)]
            if spec.fext:
                # frozen kspace forces (rRESPA outer level); their virial
                # is accumulated host-side per chunk, not here
                fx = fx + fxt_ref[0, 0]
                fy = fy + fxt_ref[0, 1]
                fz = fz + fxt_ref[0, 2]
            return fx, fy, fz, w6

        def nhc_half(vx, vy, vz, vxi, dt_, mftm_):
            """Exact scalar twin of engine._nhc_half."""
            kt = kb * T
            q0 = spec.ndof * kt * spec.tdamp**2
            q = [q0] + [kt * spec.tdamp**2] * (NHC_LEN - 1)
            dt2, dt4, dt8 = dt_ / 2.0, dt_ / 4.0, dt_ / 8.0
            ke2 = jnp.sum(mftm_ * (vx * vx + vy * vy + vz * vz))

            def g(kk, ke2_, vxi_):
                if kk == 0:
                    return (ke2_ - spec.ndof * kt) / q[0]
                return (q[kk - 1] * vxi_[kk - 1] ** 2 - kt) / q[kk]

            vxi = list(vxi)
            for kk in range(NHC_LEN - 1, -1, -1):
                if kk == NHC_LEN - 1:
                    vxi[kk] = vxi[kk] + dt4 * g(kk, ke2, vxi)
                else:
                    s = jnp.exp(-dt8 * vxi[kk + 1])
                    vxi[kk] = s * (s * vxi[kk] + dt4 * g(kk, ke2, vxi))
            scale = jnp.exp(-dt2 * vxi[0])
            vx, vy, vz = vx * scale, vy * scale, vz * scale
            ke2 = ke2 * scale * scale
            for kk in range(NHC_LEN):
                if kk == NHC_LEN - 1:
                    vxi[kk] = vxi[kk] + dt4 * g(kk, ke2, vxi)
                else:
                    s = jnp.exp(-dt8 * vxi[kk + 1])
                    vxi[kk] = s * (s * vxi[kk] + dt4 * g(kk, ke2, vxi))
            return vx, vy, vz, tuple(vxi)

        # ---- chunk loop ----
        def job_state(j):
            sl_ = jsl[j]
            return [state_ref[0, c, sl_] for c in range(6)]

        vxi_init = [tuple(fscal_ref[srow(j), _F_VXI + i]
                          for i in range(NHC_LEN)) for j in range(J)]
        use_img_cache = spec.allpairs and not spec.sw
        st0 = [job_state(j) for j in range(J)]
        if use_img_cache:
            for j in range(J):
                refresh_images(st0[j][0], st0[j][1], st0[j][2],
                               h_of(gstep0[j], j), j=j)
        f0 = [forces(st0[j][0], st0[j][1], st0[j][2], h_of(gstep0[j], j),
                     j=j) for j in range(J)]
        pacc0 = tuple(jnp.zeros((), dtype) for _ in range(6))

        def step_job(s, carry_j, j):
            (px, py, pz, vx, vy, vz, fx, fy, fz, vxi, pacc) = carry_j
            g_now = gstep0[j] + s
            h_now = h_of(g_now, j)
            # jobs whose own run already ended free-wheel as exact
            # no-ops: dt -> 0 zeroes every state update, the remap and
            # the pressure accumulation are select-gated
            live = s < n_run[j]
            dt_j = jnp.where(live, dt[j], jnp.asarray(0.0, dtype))
            inv_j = invm[j]
            mf_j = mftm[j]
            if thermostat:
                vx, vy, vz, vxi = nhc_half(vx, vy, vz, vxi, dt_j, mf_j)
            half = 0.5 * dt_j
            vx = vx + half * fx * inv_j
            vy = vy + half * fy * inv_j
            vz = vz + half * fz * inv_j
            if spec.shake_offsets:
                pox, poy, poz = px, py, pz
            px = px + dt_j * vx
            py = py + dt_j * vy
            pz = pz + dt_j * vz
            if spec.shake_offsets:
                # engine._verlet_step order: project the drifted positions,
                # then fold the correction back into the velocities
                # (constraint impulse); dt = 0 no-op jobs give a zero
                # correction, so the guarded inverse keeps them exact
                pcx, pcy, pcz = shake_rolls(
                    (px, py, pz), (pox, poy, poz), inv_j,
                    spec.shake_offsets, shk_ref[0], NT,
                    in_kernel=not spec.interpret,
                    n_iters=spec.shake_iters, relax=spec.shake_relax)
                # dt = 0 no-op jobs: the projection must not move the
                # state (incoming constraints are only approximately
                # satisfied), so gate the correction on a live dt
                live_dt = dt_j > 0.0
                inv_dt = jnp.where(
                    live_dt, 1.0 / jnp.where(live_dt, dt_j, 1.0), 0.0)
                vx = vx + (pcx - px) * inv_dt
                vy = vy + (pcy - py) * inv_dt
                vz = vz + (pcz - pz) * inv_dt
                px = jnp.where(live_dt, pcx, px)
                py = jnp.where(live_dt, pcy, py)
                pz = jnp.where(live_dt, pcz, pz)
            fx, fy, fz, w6 = forces(px, py, pz, h_now, j=j)
            vx = vx + half * fx * inv_j
            vy = vy + half * fy * inv_j
            vz = vz + half * fz * inv_j
            if spec.shake_offsets:
                rvx, rvy, rvz = rattle_rolls(
                    (vx, vy, vz), (px, py, pz), inv_j,
                    spec.shake_offsets, shk_ref[0], NT,
                    in_kernel=not spec.interpret,
                    n_iters=spec.rattle_iters, relax=spec.shake_relax)
                live_dt = dt_j > 0.0
                vx = jnp.where(live_dt, rvx, vx)
                vy = jnp.where(live_dt, rvy, vy)
                vz = jnp.where(live_dt, rvz, vz)
            if thermostat:
                vx, vy, vz, vxi = nhc_half(vx, vy, vz, vxi, dt_j, mf_j)
            if sample:
                vol = h_now[0] * h_now[1] * h_now[2]
                conv = nktv2p / vol
                kxx = jnp.sum(mf_j * vx * vx)
                kyy = jnp.sum(mf_j * vy * vy)
                kzz = jnp.sum(mf_j * vz * vz)
                kxy = jnp.sum(mf_j * vx * vy)
                kxz = jnp.sum(mf_j * vx * vz)
                kyz = jnp.sum(mf_j * vy * vz)
                kin = (kxx, kyy, kzz, kxy, kxz, kyz)
                pacc = tuple(
                    pacc[i] + jnp.where(live, (kin[i] + w6[i]) * conv, 0.0)
                    for i in range(6)
                )
            if deform:
                h_new = h_of(g_now + 1, j)
                a00, a01, a02, a11, a12, a22 = _remap_coeffs(h_now, h_new)
                pxn = a00 * px + a01 * py + a02 * pz
                pyn = a11 * py + a12 * pz
                pzn = a22 * pz
                px = jnp.where(live, pxn, px)
                py = jnp.where(live, pyn, py)
                pz = jnp.where(live, pzn, pz)
            return (px, py, pz, vx, vy, vz, fx, fy, fz, vxi, pacc)

        def step(s, carry):
            return tuple(step_job(s, carry[j], j) for j in range(J))

        carry = tuple(
            tuple(st0[j]) + (f0[j][0], f0[j][1], f0[j][2],
                             vxi_init[j], pacc0)
            for j in range(J)
        )
        n_run_max = n_run[0]
        for j in range(1, J):
            n_run_max = jnp.maximum(n_run_max, n_run[j])
        if use_img_cache:
            # chunked loop: refresh the min-image cache every R steps
            # (both loops always run >= 1 trip — a zero-trip dynamic
            # fori_loop hangs Mosaic on hardware)
            R = spec.img_refresh
            n_outer = (n_run_max + R - 1) // R

            def outer(c, carry_o):
                s0 = c * R
                for j in range(J):
                    g_j = gstep0[j] + jnp.minimum(s0, n_run[j])
                    refresh_images(carry_o[j][0], carry_o[j][1],
                                   carry_o[j][2], h_of(g_j, j), j=j)
                trips = jnp.minimum(n_run_max - s0, R)

                def inner(si, cc):
                    return step(s0 + si, cc)

                return jax.lax.fori_loop(0, trips, inner, carry_o)

            carry = jax.lax.fori_loop(0, n_outer, outer, carry)
        else:
            carry = jax.lax.fori_loop(0, n_run_max, step, carry)

        for j in range(J):
            (px, py, pz, vx, vy, vz, fx, fy, fz, vxi, pacc) = carry[j]
            state_out[0, 0, jsl[j]] = px
            state_out[0, 1, jsl[j]] = py
            state_out[0, 2, jsl[j]] = pz
            state_out[0, 3, jsl[j]] = vx
            state_out[0, 4, jsl[j]] = vy
            state_out[0, 5, jsl[j]] = vz
            state_out[0, 6, jsl[j]] = invm[j]
            state_out[0, 7, jsl[j]] = mftm[j]
            for i in range(NHC_LEN):
                sacc_ref[srow(j), _S_VXI + i] = vxi[i]
            for i in range(6):
                sacc_ref[srow(j), _S_PRESS + i] = pacc[i]
            ke2 = jnp.sum(mftm[j] * (vx * vx + vy * vy + vz * vz))
            sacc_ref[srow(j), _S_KE2] = ke2
            for i in range(_S_KE2 + 1, _SACC):
                sacc_ref[srow(j), i] = jnp.zeros((), dtype)

    return kernel


def _build_streamed_grid_call(spec, deform, sample, thermostat):
    """Batched launch for the HBM-streamed list kernel: grid over jobs.

    Pallas's own vmap batching rejects memory-space-ANY operands, and
    every alternative that leaves the batching to XLA (lax.map,
    unrolled per-job calls, optimization_barrier isolation) was measured
    on silicon to wrap the pallas call in a fusion whose scoped-vmem
    accounting caps at the 16 MB default regardless of the kernel's
    vmem_limit_bytes.  So batching happens INSIDE the one pallas call:
    grid=(B,), one sequential program per job; blocked operands index
    their job's block, the ANY-space neighbor channels carry a leading
    B axis the kernel slices via program_id(0) (FusedSpec.batch_grid),
    and VMEM scratch is reused across programs.  The unbatched shape —
    hardware-proven — is exactly the B=1 case.

    The returned callable takes the base (B-form) operands; a
    custom_vmap rule folds any further vmap level into the grid
    (leading axes multiply into B), so nested job/replica vmaps all
    land in one kernel launch.
    """
    NT, K, J = spec.nt, spec.k, spec.jobs
    assert J == 1, "streamed kernels do not multi-job pack"
    kern = _make_kernel(
        FusedSpec(**{**spec.__dict__, "batch_grid": True}),
        deform, sample, thermostat)
    n_stream = 7 if spec.coul else 6
    KC = spec.k_chunk

    # which operand slots carry a per-job leading axis (the rest are
    # system constants or unread placeholders, shared across the grid)
    batched_slots = ((True,) * 3          # iscal, fscal, state
                     + (True,) * 6        # streamed neighbor channels
                     + (bool(spec.coul),)  # qq
                     + (False, False, False)  # topo, pat, shk
                     + (bool(spec.fext),))   # fxt

    def base(iscal, fscal, state, idx, w4e, sig2, imx, imy, imz,
             qq, topo, pat, shk, fxt):
        B = state.shape[0]
        dtype = state.dtype

        # SMEM rows can't tile on TPU (last-two-dims rule): scalar
        # windows stay FULL (B*J, _) and the kernel indexes row
        # jb0*J + j (srow)
        smem_full = pl.BlockSpec(memory_space=pltpu.SMEM)
        any_full = pl.BlockSpec(memory_space=pl.ANY)
        ph_spec = pl.BlockSpec((1, 1, 1), lambda b: (0, 0, 0),
                               memory_space=pl.ANY)

        def shared(arr):
            if arr.shape == (1, 1, 1):
                return ph_spec
            nd = arr.ndim
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda b, nd=nd: (0,) * nd)

        def perjob(arr):
            if arr.shape == (1, 1, 1):
                return ph_spec
            nd = arr.ndim
            return pl.BlockSpec((1,) + arr.shape[1:],
                                lambda b, nd=nd: (b,) + (0,) * (nd - 1))

        in_specs = [
            smem_full, smem_full,
            pl.BlockSpec((1, 8, J * NT, LANE), lambda b: (b, 0, 0, 0)),
            any_full, any_full, any_full, any_full, any_full, any_full,
            (any_full if spec.coul else ph_spec),
            shared(topo), shared(pat), shared(shk), perjob(fxt),
        ]
        scratch_shapes = (
            [pltpu.VMEM((2, KC, NT, LANE), jnp.int32)]
            + [pltpu.VMEM((2, KC, NT, LANE), dtype)] * (n_stream - 1)
            + [pltpu.SemaphoreType.DMA((2, n_stream))]
        )
        return pl.pallas_call(
            kern,
            grid=(B,),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=116 * 1024 * 1024,
                dimension_semantics=("arbitrary",)),
            scratch_shapes=scratch_shapes,
            out_shape=(
                jax.ShapeDtypeStruct((B, 8, J * NT, LANE), dtype),
                jax.ShapeDtypeStruct((B * J, _SACC), dtype),
            ),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec((1, 8, J * NT, LANE), lambda b: (b, 0, 0, 0)),
                smem_full,
            ),
            interpret=spec.interpret,
        )(iscal, fscal, state, idx, w4e, sig2, imx, imy, imz,
          qq, topo, pat, shk, fxt)

    call = jax.custom_batching.custom_vmap(base)

    @call.def_vmap
    def _rule(axis_size, in_batched, *args):
        inb = jax.tree_util.tree_leaves(in_batched)
        folded = []
        for a, ib, want in zip(args, inb, batched_slots):
            if not want:
                # shared operands (topo rows, placeholders) are
                # vmap-constant by construction
                assert not ib, "unexpected batching of a shared operand"
                folded.append(a)
                continue
            if not ib:
                a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
            folded.append(a.reshape((a.shape[0] * a.shape[1],)
                                    + a.shape[2:]))
        st, sacc = call(*folded)
        stb = st.reshape((axis_size, st.shape[0] // axis_size)
                         + st.shape[1:])
        sab = sacc.reshape((axis_size, sacc.shape[0] // axis_size)
                           + sacc.shape[1:])
        return (stb, sab), (True, True)

    return call


@partial(jax.jit, static_argnames=("spec", "deform", "sample", "thermostat"))
def fused_chunk(spec: FusedSpec, state, channels, iscal, fscal,
                deform=True, sample=False, thermostat=True):
    """Run one fused chunk.

    state: (8, NT, 128); channels: dict with idx/w4e/sig2/imx/imy/imz[/qq]
    each (K, NT, 128); iscal: (ISCAL,) int32; fscal: (FSCAL,) float.
    Returns (state', sacc (SACC,)).
    """
    NT, K = spec.nt, spec.k
    J = spec.jobs
    if J > 1:
        assert spec.allpairs and not spec.sw, \
            "multi-job packing is an all-pairs LJ/OPLS mechanism"
    dtype = state.dtype
    kern = _make_kernel(spec, deform, sample, thermostat)
    npad = NT * LANE
    # all-pairs parameter planes arrive triangle-packed (pack_tri_plane),
    # or dense (NPAD, NPAD) in the round-3 fallback layout
    nblk = tri_nblk(NT)
    if spec.tri_packed:
        dense_spec = pl.BlockSpec((1, nblk * LANE, LANE), lambda: (0, 0, 0))
    else:
        dense_spec = pl.BlockSpec((1, npad, npad), lambda: (0, 0, 0))
    # scalar rows are per-job: accept (_ISCAL,) (the J = 1 convention)
    # or (J, _ISCAL)
    if iscal.ndim == 1:
        iscal = iscal[None]
    if fscal.ndim == 1:
        fscal = fscal[None]
    qq = channels.get("qq")
    if qq is None:
        qq = jnp.zeros((1, 1, 1), dtype)  # placeholder, never read
        qq_spec = pl.BlockSpec((1, 1, 1), lambda: (0, 0, 0),
                               memory_space=pl.ANY)
    elif spec.allpairs:
        qq_spec = dense_spec
        qq = qq[None]
    elif spec.k_chunk:
        qq_spec = pl.BlockSpec(memory_space=pl.ANY)
        qq = qq[None]
    else:
        qq_spec = pl.BlockSpec((1, K, NT, LANE), lambda: (0, 0, 0, 0))
        qq = qq[None]
    topo = channels.get("topo")
    if topo is None:
        topo = jnp.zeros((1, 1, 1), dtype)  # placeholder, never read
        topo_spec = pl.BlockSpec((1, 1, 1), lambda: (0, 0, 0),
                                 memory_space=pl.ANY)
    else:
        topo_spec = pl.BlockSpec((1, _TOPO, NT, LANE), lambda: (0, 0, 0, 0))
        topo = topo[None]

    def ch_or_placeholder(name):
        arr = channels.get(name)
        if arr is None:
            ph = jnp.zeros((1, 1, 1), dtype)
            return ph, pl.BlockSpec((1, 1, 1), lambda: (0, 0, 0),
                                    memory_space=pl.ANY)
        sp = pl.BlockSpec((1,) + arr.shape,
                          lambda *_: (0,) * (arr.ndim + 1))
        return arr[None], sp

    pat, pat_spec = ch_or_placeholder("pat")  # pattern-bonded param rows
    shk, shk_spec = ch_or_placeholder("shk")  # SHAKE d0^2 rows
    fxt, fxt_spec = ch_or_placeholder("fext")  # frozen kspace forces

    if spec.allpairs:
        # dense (NPAD, NPAD) parameter matrices; idx/img slots are unread.
        # SW mode is parameter-free per pair — every channel slot is a
        # placeholder (the kernel closes over spec.sw_params).
        placeholder = jnp.zeros((1, 1, 1), dtype)
        ph_spec = pl.BlockSpec((1, 1, 1), lambda: (0, 0, 0),
                               memory_space=pl.ANY)
        if "w4e" in channels:
            w4e_op, w4e_sp = channels["w4e"][None], dense_spec
            sig2_op, sig2_sp = channels["sig2"][None], dense_spec
        else:
            w4e_op = sig2_op = placeholder
            w4e_sp = sig2_sp = ph_spec
        operands = [
            placeholder,  # idx (unread)
            w4e_op, sig2_op,
            placeholder, placeholder, placeholder,  # images (unread)
        ]
        operand_specs = [ph_spec, w4e_sp, sig2_sp,
                         ph_spec, ph_spec, ph_spec]
    else:
        if spec.k_chunk:
            # HBM-streamed channels: the kernel double-buffers K-chunks
            # into VMEM scratch (no whole-channel VMEM window)
            assert K % spec.k_chunk == 0, \
                f"k={K} must be a multiple of k_chunk={spec.k_chunk}"
            nbr_spec = pl.BlockSpec(memory_space=pl.ANY)
        else:
            nbr_spec = pl.BlockSpec((1, K, NT, LANE), lambda: (0, 0, 0, 0))
        operands = [
            channels["idx"][None], channels["w4e"][None],
            channels["sig2"][None], channels["imx"][None],
            channels["imy"][None], channels["imz"][None],
        ]
        operand_specs = [nbr_spec] * 6
    # min-image integer cache for the cached-Newton all-pairs path —
    # triangle-packed like the parameter planes, bf16 by default (the
    # cached values are small integers, exact in bf16; together the two
    # layouts cut the charged plane budget ~2.5x and raise the VMEM gate)
    scratch_shapes = []
    if spec.allpairs and not spec.sw:
        img_dtype = jnp.bfloat16 if spec.img_bf16 else dtype
        if spec.tri_packed:
            scratch_shapes = [pltpu.VMEM((J * nblk * LANE, LANE),
                                         img_dtype)] * 3
        else:
            scratch_shapes = [pltpu.VMEM((J * npad, npad), img_dtype)] * 3
    elif spec.k_chunk and not spec.sw:
        # streamed-list double buffers: one (2, KC, NT, LANE) buffer per
        # channel (idx int32, the rest dtype) + a DMA semaphore per
        # (slot, channel)
        n_stream = 7 if spec.coul else 6
        KC = spec.k_chunk
        scratch_shapes = (
            [pltpu.VMEM((2, KC, NT, LANE), jnp.int32)]
            + [pltpu.VMEM((2, KC, NT, LANE), dtype)] * (n_stream - 1)
            + [pltpu.SemaphoreType.DMA((2, n_stream))]
        )
    call = pl.pallas_call(
        kern,
        # wide-K channel sets (OPLS ~232 slots) exceed Mosaic's default
        # 16M scoped-vmem budget; v5e has 128 MiB physical VMEM.  116 MB
        # (not 100) because the charged 1792-atom all-pairs build measures
        # 109.41 MB of scoped allocations on hardware — the gate in
        # material.py keeps requests under this via the 1.42x calibration.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=116 * 1024 * 1024),
        scratch_shapes=scratch_shapes,
        out_shape=(
            jax.ShapeDtypeStruct((1, 8, J * NT, LANE), dtype),
            jax.ShapeDtypeStruct((J, _SACC), dtype),
        ),
        in_specs=[
            pl.BlockSpec((J, _ISCAL), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((J, _FSCAL), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, J * NT, LANE), lambda: (0, 0, 0, 0)),
            *operand_specs,
            qq_spec,
            topo_spec,
            pat_spec,
            shk_spec,
            fxt_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 8, J * NT, LANE), lambda: (0, 0, 0, 0)),
            pl.BlockSpec((J, _SACC), lambda: (0, 0), memory_space=pltpu.SMEM),
        ),
        interpret=spec.interpret,
    )
    if spec.k_chunk and not spec.sw and (
            not spec.interpret
            or os.environ.get("SCEMA_TEST_GRID_CALL") == "1"):
        # HBM-streamed channels on hardware: launch through the job-grid
        # form (_build_streamed_grid_call — Pallas-native batching;
        # every XLA-side batching of this call was measured to hit the
        # 16 MB fusion scoped-vmem ceiling).  The B=1 call made here is
        # shape-identical to the round-5 hardware-validated unbatched
        # kernel; further vmap levels fold into the grid.  Interpret
        # mode (CPU tests) keeps the gridless call + Pallas's native
        # batching below, which both work there — SCEMA_TEST_GRID_CALL=1
        # forces the grid form under interpret so its semantics stay
        # CPU-testable.
        gcall = _build_streamed_grid_call(spec, deform, sample, thermostat)
        st, sacc = gcall(
            iscal, fscal, state[None],
            *[op[:, None] for op in operands],  # (1, K, NT, L) -> B-form
            (qq[:, None] if spec.coul else qq),
            topo, pat, shk, fxt,
        )
        return st[0], (sacc[0] if J == 1 else sacc)
    out = call(
        iscal, fscal, state[None],
        *operands,
        qq, topo, pat, shk, fxt,
    )
    st, sacc = out
    return st[0], (sacc[0] if J == 1 else sacc)


# --------------------------------------------------------------------------
# XLA-side packing: state + neighbor channels


def pad_n(n: int) -> int:
    return ((n + LANE - 1) // LANE) * LANE


def pack_state(pos, vel, masses, ftm2v, vxi=None, dtype=None):
    """(N,3)x2 + (N,) -> (8, NT, 128) state block (+ initial fscal vxi)."""
    dtype = dtype or pos.dtype
    n = pos.shape[0]
    npad = pad_n(n)
    NT = npad // LANE

    def ch(x):
        return jnp.pad(x.astype(dtype), (0, npad - n)).reshape(NT, LANE)

    invm = jnp.where(masses > 0, ftm2v / masses, 0.0)
    mftm = masses / ftm2v
    rows = [ch(pos[:, 0]), ch(pos[:, 1]), ch(pos[:, 2]),
            ch(vel[:, 0]), ch(vel[:, 1]), ch(vel[:, 2]),
            ch(invm), ch(mftm)]
    return jnp.stack(rows)


def pack_fext(F, n_atoms: int, dtype=None):
    """(N, 3) external (kspace) forces -> (3, NT, 128) channel."""
    dtype = dtype or F.dtype
    npad = pad_n(n_atoms)
    nt = npad // LANE
    Fp = jnp.pad(F.astype(dtype), ((0, npad - n_atoms), (0, 0)))
    return jnp.moveaxis(Fp.reshape(nt, LANE, 3), 2, 0)


def unpack_state(state, n):
    """(8, NT, 128) -> (pos (N,3), vel (N,3))."""
    flat = state.reshape(8, -1)[:, :n]
    pos = jnp.stack([flat[0], flat[1], flat[2]], axis=-1)
    vel = jnp.stack([flat[3], flat[4], flat[5]], axis=-1)
    return pos, vel


def pack_channels(pos, h, nbr: NB.NeighborList, eps_pair, sig_pair,
                  weights=None, qq_pair=None, qq_weights=None, dtype=None,
                  k_pad=None):
    """Neighbor channels from a built list.

    eps_pair/sig_pair/weights/qq_pair: (N, K) per-slot values (already
    type-resolved); ``qq_weights`` carries the Coulomb special-bond
    weights when they differ from the LJ ones.  Returns dict of
    (K, NT, 128) channels; invalid slots carry w4e = 0 and image 0.
    ``k_pad`` widens the slot axis with dead slots (the dense list
    builder caps K at n-1, which may undershoot the static kernel width).
    """
    dtype = dtype or pos.dtype
    n, k = nbr.idx.shape
    if k_pad is not None and k_pad > k:
        extra = k_pad - k
        nbr = NB.NeighborList(
            idx=jnp.concatenate(
                [nbr.idx, jnp.broadcast_to(
                    jnp.arange(n, dtype=jnp.int32)[:, None], (n, extra))],
                axis=1),
            mask=jnp.concatenate(
                [nbr.mask, jnp.zeros((n, extra), bool)], axis=1),
        )
        pad2 = lambda x: jnp.concatenate(
            [x, jnp.zeros((n, extra), x.dtype)], axis=1)
        eps_pair = pad2(eps_pair)
        sig_pair = pad2(sig_pair)
        if weights is not None:
            weights = pad2(weights)
        if qq_pair is not None:
            qq_pair = pad2(qq_pair)
        if qq_weights is not None:
            qq_weights = pad2(qq_weights)
        k = k_pad
    npad = pad_n(n)
    NT = npad // LANE

    # periodic images: n_ij = -round(inv_h (pos_j - pos_i)) so that
    # d = pos_j + h n_ij - pos_i is the minimum image (exact under any
    # later affine deform — fractional coordinates are held fixed).
    # Component-wise on (N, K) planes, NOT an (N, K, 3) tensor: XLA TPU
    # tiles a trailing dim of 3 to 128 (T(8,128)), so the (jobs, N, K, 3)
    # form allocated 20.5 GB at the 4480-atom 8-job rebuild (round-5
    # ladder: "f32[40140800,3] would exceed memory") where these
    # (N, K) planes tile losslessly.
    ih = B.inv_h(h)
    dxyz = [pos[nbr.idx, a] - pos[:, None, a] for a in range(3)]
    img = [
        -jnp.round(ih[a, 0] * dxyz[0] + ih[a, 1] * dxyz[1]
                   + ih[a, 2] * dxyz[2])
        for a in range(3)
    ]

    w = nbr.mask.astype(dtype)
    if weights is not None:
        w = w * weights.astype(dtype)
    w4e = 4.0 * eps_pair.astype(dtype) * w

    def ch(x, fill=0.0):
        x = x.astype(dtype) if x.dtype != jnp.int32 else x
        pad_rows = jnp.full((npad - n, k), fill, dtype=x.dtype)
        full = jnp.concatenate([x, pad_rows], axis=0)  # (npad, K)
        return full.T.reshape(k, NT, LANE)

    self_pad = jnp.arange(n, dtype=jnp.int32)[:, None] * jnp.ones(
        (1, k), jnp.int32)
    idx = jnp.where(nbr.mask, nbr.idx, self_pad).astype(jnp.int32)
    idx_fill = jnp.concatenate(
        [idx, jnp.zeros((npad - n, k), jnp.int32)], axis=0
    ).T.reshape(k, NT, LANE)

    out = {
        "idx": idx_fill,
        "w4e": ch(w4e),
        "sig2": ch(sig_pair.astype(dtype) ** 2),
        "imx": ch(img[0]),
        "imy": ch(img[1]),
        "imz": ch(img[2]),
    }
    if qq_pair is not None:
        wq = nbr.mask.astype(dtype)
        if qq_weights is not None:
            wq = wq * qq_weights.astype(dtype)
        elif weights is not None:
            wq = wq * weights.astype(dtype)
        out["qq"] = ch(qq_pair * wq)
    return out


def pack_channels_from_parts(idx, mask, img, w4e, sig2, qq=None,
                             k_pad=None, dtype=None):
    """Channel packing from already-decoded per-slot arrays (the packed
    fast path — no neighbor-coordinate gathers; images come decoded from
    the top_k payload as three (N, K) planes)."""
    dtype = dtype or w4e.dtype
    n, k = idx.shape
    if k_pad is not None and k_pad > k:
        extra = k_pad - k
        pad2 = lambda x, fill=0.0: jnp.concatenate(
            [x, jnp.full((n, extra), fill, x.dtype)], axis=1)
        idx = jnp.concatenate(
            [idx, jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[:, None], (n, extra))], axis=1)
        mask = jnp.concatenate([mask, jnp.zeros((n, extra), bool)], axis=1)
        w4e, sig2 = pad2(w4e), pad2(sig2)
        img = tuple(jnp.concatenate(
            [c, jnp.zeros((n, extra), c.dtype)], axis=1) for c in img)
        if qq is not None:
            qq = pad2(qq)
        k = k_pad
    npad = pad_n(n)
    NT = npad // LANE

    def ch(x, fill=0.0):
        x = x.astype(dtype) if x.dtype != jnp.int32 else x
        pad_rows = jnp.full((npad - n, k), fill, dtype=x.dtype)
        full = jnp.concatenate([x, pad_rows], axis=0)
        return full.T.reshape(k, NT, LANE)

    out = {
        "idx": ch(idx, fill=0),
        "w4e": ch(w4e),
        "sig2": ch(sig2),
        "imx": ch(img[0]),
        "imy": ch(img[1]),
        "imz": ch(img[2]),
    }
    if qq is not None:
        out["qq"] = ch(qq)
    return out


def pack_topo(topo, par, n_atoms: int, dtype=jnp.float32) -> jnp.ndarray:
    """Chain topology -> (16, NT, 128) per-atom term channels.

    Requires *linear-chain* topology in flat atom order: every bond is
    (i, i+1), every angle (i, i+1, i+2), every dihedral (i..i+3), no
    impropers — what data_io.build_alkane_melt produces.  Raises for
    anything else (callers fall back to the XLA bonded path).
    """
    npad = pad_n(n_atoms)
    NT = npad // LANE
    rows = np.zeros((_TOPO, npad), dtype=np.float64)

    bonds = np.asarray(topo.bonds)
    btyp = np.asarray(topo.bond_type)
    for arr, name, width in ((bonds, "bond", 2),
                             (np.asarray(topo.angles), "angle", 3),
                             (np.asarray(topo.dihedrals), "dihedral", 4)):
        if arr.shape[0] and not (
            arr == arr[:, :1] + np.arange(width)[None, :]
        ).all():
            raise ValueError(
                f"pack_topo: non-chain {name} topology — use the XLA path"
            )
    if np.asarray(topo.impropers).shape[0]:
        raise ValueError("pack_topo: impropers not supported in chain mode")

    bk = np.asarray(par.bond_k)
    br0 = np.asarray(par.bond_r0)
    for (i, _j), t in zip(bonds, btyp):
        if t < 0:
            continue
        rows[_T_BMASK, i] = 1.0
        rows[_T_BK, i] = bk[t]
        rows[_T_BR0, i] = br0[t]
    ak = np.asarray(par.angle_k)
    ath = np.asarray(par.angle_theta0)
    for (i, _j, _k), t in zip(np.asarray(topo.angles), np.asarray(topo.angle_type)):
        if t < 0:
            continue
        rows[_T_AMASK, i] = 1.0
        rows[_T_AK, i] = ak[t]
        rows[_T_ATH0, i] = ath[t]
    dk = np.asarray(par.dihedral_k)
    for (i, *_), t in zip(np.asarray(topo.dihedrals),
                          np.asarray(topo.dihedral_type)):
        if t < 0:
            continue
        rows[_T_DMASK, i] = 1.0
        rows[_T_DK1:_T_DK1 + 4, i] = dk[t]
    return jnp.asarray(rows.reshape(_TOPO, NT, LANE), dtype=dtype)


def make_fscal(dt, T, h, eps=None, vxi=None, dtype=jnp.float32):
    """Scalar block for one chunk call."""
    h6 = jnp.stack([h[0, 0], h[1, 1], h[2, 2], h[0, 1], h[0, 2], h[1, 2]])
    f = jnp.zeros((_FSCAL,), dtype)
    f = f.at[_F_DT].set(dt)
    f = f.at[_F_T].set(T)
    f = f.at[_F_H0:_F_H0 + 6].set(h6.astype(dtype))
    if eps is not None:
        f = f.at[_F_EPS:_F_EPS + 6].set(jnp.asarray(eps, dtype))
    if vxi is not None:
        f = f.at[_F_VXI:_F_VXI + NHC_LEN].set(jnp.asarray(vxi, dtype))
    return f


def make_iscal(n_run, gstep0=0, n_tot=1):
    return jnp.stack([
        jnp.asarray(n_run, jnp.int32),
        jnp.asarray(gstep0, jnp.int32),
        jnp.asarray(n_tot, jnp.int32),
        jnp.zeros((), jnp.int32),
    ])


def sacc_vxi(sacc):
    return sacc[_S_VXI:_S_VXI + NHC_LEN]


def sacc_press(sacc):
    return sacc[_S_PRESS:_S_PRESS + 6]


# --------------------------------------------------------------------------
# Engine-pluggable runner: chunked strain/NVT/sampling runs with XLA
# neighbor rebuilds between fused chunks (md/engine.py dispatches here
# when MDSystem.fused is set).


@dataclass(frozen=True)
class FusedRunner:
    """Static fused-path configuration for one MD system.

    ``weights_fn(nbr) -> (N, K)`` provides special-bonds LJ weights (OPLS);
    ``topo`` is the packed chain-topology channel block or None.
    """

    spec: FusedSpec
    nspec: NB.NeighborSpec
    masses: jax.Array  # (N,)
    eps_table: jax.Array  # (ntypes, ntypes)
    sig_table: jax.Array
    types: jax.Array  # (N,) int32
    rebuild_every: int
    weights_fn: object = None
    weights_coul_fn: object = None  # Coulomb special-bond weights (may
    # differ from LJ's — special_bonds lj vs coul, opls.py:102-106)
    topo: object = None
    qq_table: object = None  # (N,) charge * sqrt(qqr2e) when coul
    # packed-rebuild fast path: per-pair class matrix + value LUTs
    # (None = generic gather path).  Built by material._runner_pair_classes.
    pair_cls: object = None  # (N, N) int32 in [0, n_cls)
    lut_w4e: object = None  # (n_cls,)
    lut_sig2: object = None
    lut_qq: object = None
    # all-pairs mode: dense (NPAD, NPAD) parameter matrices, built once at
    # setup (position-independent) — channels() then costs nothing
    dense_lj1: object = None
    dense_lj2: object = None
    dense_qq: object = None
    # offset-pattern bonded parameter rows (pack_patterns) — all-atom
    # topologies; the static pattern tuple lives in spec.bonded_pattern
    pat_rows: object = None
    # SHAKE d0^2 rows (pack_shake); offsets live in spec.shake_offsets
    shk_rows: object = None
    # kspace (PME) split: fn(pos, h) -> (N, 3) smooth remainder force
    # [exact Ewald total minus the kernel's plain-cut coulomb], frozen
    # for ``kspace_every`` steps (rRESPA outer level); the companion
    # virial fn(pos, h) -> Voigt-6 feeds the sampling accumulator
    kspace_fn: object = None
    kspace_virial_fn: object = None
    kspace_every: int = 10

    def _static_rows(self, ch, dtype):
        """Attach the position-independent channel rows (chain topo,
        offset-pattern params, SHAKE d0^2) — shared by every builder."""
        if self.topo is not None:
            ch["topo"] = self.topo.astype(dtype)
        if self.pat_rows is not None:
            ch["pat"] = self.pat_rows.astype(dtype)
        if self.shk_rows is not None:
            ch["shk"] = self.shk_rows.astype(dtype)
        return ch

    def channels(self, pos, h):
        if self.spec.sw:
            return {}  # parameter-free: everything closes over sw_params
        if self.spec.allpairs:
            ch = {"w4e": self.dense_lj1, "sig2": self.dense_lj2}
            if self.dense_qq is not None:
                ch["qq"] = self.dense_qq
            return self._static_rows(ch, pos.dtype)
        if self.pair_cls is not None:
            return self._channels_packed(pos, h)
        nbr = NB.build(self.nspec, pos, h)
        ti = self.types[:, None]
        tj = self.types[nbr.idx]
        eps_pair = self.eps_table[ti, tj]
        sig_pair = self.sig_table[ti, tj]
        w = self.weights_fn(nbr) if self.weights_fn is not None else None
        qq = None
        wq = None
        if self.qq_table is not None:
            qq = self.qq_table[:, None] * self.qq_table[nbr.idx]
            if self.weights_coul_fn is not None:
                wq = self.weights_coul_fn(nbr)
        ch = pack_channels(pos, h, nbr, eps_pair, sig_pair, weights=w,
                           qq_pair=qq, qq_weights=wq, dtype=pos.dtype,
                           k_pad=self.spec.k)
        return self._static_rows(ch, pos.dtype)

    def _channels_packed(self, pos, h):
        """Rebuild via the payload-packed single-top_k dense path — the
        post-top_k work is pure elementwise decode (no gathers), ~10x
        cheaper than the generic path on v5e."""
        dtype = pos.dtype
        pk = NB.build_dense_packed(self.nspec, pos, h, self.pair_cls)

        def lut(values, cls):
            vals = np.asarray(values)
            out = jnp.zeros(cls.shape, dtype)
            for c in range(vals.shape[0]):  # n_cls <= 16, unrolled selects
                out = jnp.where(cls == c, jnp.asarray(vals[c], dtype), out)
            return out

        w4e = lut(self.lut_w4e, pk.cls) * pk.mask.astype(dtype)
        sig2 = lut(self.lut_sig2, pk.cls)
        qq = None
        if self.lut_qq is not None:
            qq = lut(self.lut_qq, pk.cls) * pk.mask.astype(dtype)
        ch = pack_channels_from_parts(
            pk.idx, pk.mask, pk.img, w4e, sig2, qq=qq,
            k_pad=self.spec.k, dtype=dtype,
        )
        return self._static_rows(ch, dtype)


def _chunk_steps(rebuild_every: int) -> int:
    """Chunk length for the list-kernel fused paths.

    The chunk loop floors the step count to a multiple of the chunk
    length, so the chunk length must divide every possible count or the
    deform run stops short of the full strain.  nts is always a multiple
    of 10 (stmd_problem.h:228-232 formula) and nssample is conventionally
    too, so clamp to the largest divisor of 10 not exceeding the
    requested rebuild interval.  (The all-pairs path has no chunks and no
    such constraint.)
    """
    for d in (10, 5, 2, 1):
        if rebuild_every >= d:
            return d
    return 1


def run_strain_fused(runner: FusedRunner, state, eps_eff, n_steps, T, dt):
    """engine.run_strain semantics on the fused kernel (chunked rebuilds,
    or a single whole-run kernel call in all-pairs mode)."""
    from ..md import engine as E

    spec = runner.spec
    if spec.allpairs:
        dtype = state.pos.dtype
        # n_steps = 0 (inactive padding job) is made safe HERE: a
        # zero-trip dynamic fori_loop hangs the Mosaic kernel on real
        # v5e hardware (measured; interpret mode is fine), so the kernel
        # always runs >= 1 step and a zero request is neutralized with
        # dt = 0 and eps = 0 — an exact no-op on the state.
        n_steps = jnp.asarray(n_steps)
        live = n_steps > 0
        dt_eff = jnp.where(live, dt, 0.0)
        eps_k = jnp.where(live, jnp.asarray(eps_eff, dtype), 0.0)
        ch = runner.channels(state.pos, state.h)
        st8 = pack_state(state.pos, state.vel, runner.masses, spec.ftm2v,
                         dtype=dtype)
        ns = jnp.maximum(n_steps, 1)
        if runner.kspace_fn is None:
            fscal = make_fscal(dt_eff, T, state.h, eps=eps_k,
                               vxi=state.vxi, dtype=dtype)
            iscal = make_iscal(ns, 0, ns)
            st8, sacc = fused_chunk(spec, st8, ch, iscal, fscal,
                                    deform=True, sample=False)
            vxi_end = sacc_vxi(sacc)
        else:
            # kspace split: freeze the smooth remainder force for Rk
            # steps at a time (rRESPA outer level) and re-evaluate the
            # PME mesh in XLA between fused chunks
            Rk = runner.kspace_every
            n_ch = (ns + Rk - 1) // Rk
            h0 = state.h

            def chunk(c, carry):
                st8c, vxi = carry
                g0 = c * Rk
                frac = g0.astype(dtype) / ns.astype(dtype)
                h_c = B.deform_path(h0, eps_k, frac)
                pos_c, _ = unpack_state(st8c, spec.n_atoms)
                fk = runner.kspace_fn(pos_c, h_c)
                ch_c = {**ch, "fext": pack_fext(fk, spec.n_atoms, dtype)}
                fscal_c = make_fscal(dt_eff, T, h0, eps=eps_k, vxi=vxi,
                                     dtype=dtype)
                iscal_c = make_iscal(jnp.minimum(ns - g0, Rk), g0, ns)
                st8c, sacc = fused_chunk(spec, st8c, ch_c, iscal_c,
                                         fscal_c, deform=True, sample=False)
                return st8c, sacc_vxi(sacc)

            st8, vxi_end = jax.lax.fori_loop(
                0, n_ch, chunk, (st8, jnp.asarray(state.vxi, dtype)))
        pos, vel = unpack_state(st8, spec.n_atoms)
        frac_end = jnp.where(live, 1.0, 0.0).astype(dtype)
        h_end = B.deform_path(state.h, jnp.asarray(eps_eff, dtype), frac_end)
        return E.MDState(pos=pos, vel=vel, h=h_end, vxi=vxi_end)
    R = _chunk_steps(runner.rebuild_every)
    if runner.kspace_fn is not None:
        # list-path kspace split: chunks run at the SHORTER of the
        # rebuild and kspace cadences so both refreshes happen on time
        # (rebuilding more often than rebuild_every is always safe;
        # kspace_every stays an honest accuracy knob on this path too)
        R = min(R, max(1, int(runner.kspace_every)))
    n_steps = jnp.maximum(jnp.asarray(n_steps), R)
    n_chunks = n_steps // R
    h0 = state.h
    dtype = state.pos.dtype
    eps = jnp.asarray(eps_eff, dtype)

    def chunk(c, carry):
        pos, vel, vxi = carry
        gstep0 = c * R
        frac = gstep0.astype(dtype) / n_steps.astype(dtype)
        h_c = B.deform_path(h0, eps, frac)
        ch = runner.channels(pos, h_c)
        if runner.kspace_fn is not None:
            fk = runner.kspace_fn(pos, h_c)
            ch = {**ch, "fext": pack_fext(fk, spec.n_atoms, dtype)}
        st8 = pack_state(pos, vel, runner.masses, spec.ftm2v, dtype=dtype)
        fscal = make_fscal(dt, T, h0, eps=eps, vxi=vxi, dtype=dtype)
        iscal = make_iscal(R, gstep0, n_steps)
        st8, sacc = fused_chunk(spec, st8, ch, iscal, fscal,
                                deform=True, sample=False)
        pos, vel = unpack_state(st8, spec.n_atoms)
        return pos, vel, sacc_vxi(sacc)

    pos, vel, vxi = jax.lax.fori_loop(
        0, n_chunks, chunk, (state.pos, state.vel, state.vxi)
    )
    frac_end = (n_chunks * R).astype(dtype) / n_steps.astype(dtype)
    h_end = B.deform_path(h0, eps, frac_end)
    return E.MDState(pos=pos, vel=vel, h=h_end, vxi=vxi)


def _pack_state_multi(runner, state_J, dtype):
    """Stacked-J MDState -> (8, J*NT, 128) kernel state."""
    spec = runner.spec
    st8 = jax.vmap(lambda p, v: pack_state(
        p, v, runner.masses, spec.ftm2v, dtype=dtype))(
            state_J.pos, state_J.vel)  # (J, 8, NT, L)
    return jnp.concatenate([st8[j] for j in range(st8.shape[0])], axis=1)


def _unpack_state_multi(st8, spec, J):
    """(8, J*NT, 128) -> stacked (J, N, 3) pos/vel."""
    NT = spec.nt
    parts = [unpack_state(st8[:, j * NT:(j + 1) * NT], spec.n_atoms)
             for j in range(J)]
    pos = jnp.stack([p for p, _ in parts])
    vel = jnp.stack([v for _, v in parts])
    return pos, vel


def run_strain_fused_multi(runner: FusedRunner, state_J, eps_J, n_steps_J,
                           T, dt_J):
    """J jobs in ONE kernel program (FusedSpec.jobs packing): the
    per-job semantics of run_strain_fused, bit-for-bit — jobs whose own
    step count ends early free-wheel as exact no-ops inside the shared
    trip loop.  All leaves of ``state_J``/args carry a leading J axis.
    No kspace split here (charged systems run jobs=1)."""
    from ..md import engine as E

    spec = runner.spec
    J = int(state_J.pos.shape[0])
    mspec = FusedSpec(**{**spec.__dict__, "jobs": J})
    assert mspec.allpairs and not mspec.sw and not mspec.fext
    dtype = state_J.pos.dtype
    n_steps_J = jnp.asarray(n_steps_J)
    live = n_steps_J > 0
    dt_eff = jnp.where(live, jnp.broadcast_to(jnp.asarray(dt_J, dtype), (J,)),
                       0.0)
    eps_k = jnp.where(live[:, None], jnp.asarray(eps_J, dtype), 0.0)
    ns = jnp.maximum(n_steps_J, 1)
    ch = runner.channels(state_J.pos[0], state_J.h[0])
    st8 = _pack_state_multi(runner, state_J, dtype)
    fscal = jax.vmap(lambda d, h, e, x: make_fscal(
        d, T, h, eps=e, vxi=x, dtype=dtype))(
            dt_eff, state_J.h, eps_k, state_J.vxi)
    iscal = jax.vmap(make_iscal)(ns, jnp.zeros((J,), jnp.int32), ns)
    st8, sacc = fused_chunk(mspec, st8, ch, iscal, fscal,
                            deform=True, sample=False)
    pos, vel = _unpack_state_multi(st8, spec, J)
    frac_end = jnp.where(live, 1.0, 0.0).astype(dtype)
    h_end = jax.vmap(B.deform_path)(state_J.h, eps_k, frac_end)
    vxi = jax.vmap(sacc_vxi)(sacc)
    return E.MDState(pos=pos, vel=vel, h=h_end, vxi=vxi)


def sample_stress_fused_multi(runner: FusedRunner, state_J, n_steps_J,
                              T, dt_J):
    """J-packed sample_stress_fused (see run_strain_fused_multi)."""
    from ..md import engine as E

    spec = runner.spec
    J = int(state_J.pos.shape[0])
    mspec = FusedSpec(**{**spec.__dict__, "jobs": J})
    assert mspec.allpairs and not mspec.sw and not mspec.fext
    dtype = state_J.pos.dtype
    n_arr = jnp.asarray(n_steps_J)
    dt_eff = jnp.where(n_arr > 0,
                       jnp.broadcast_to(jnp.asarray(dt_J, dtype), (J,)), 0.0)
    ns = jnp.maximum(n_arr, 1)
    ch = runner.channels(state_J.pos[0], state_J.h[0])
    st8 = _pack_state_multi(runner, state_J, dtype)
    fscal = jax.vmap(lambda d, h, x: make_fscal(
        d, T, h, vxi=x, dtype=dtype))(dt_eff, state_J.h, state_J.vxi)
    iscal = jax.vmap(make_iscal)(ns, jnp.zeros((J,), jnp.int32),
                                 jnp.ones((J,), jnp.int32))
    st8, sacc = fused_chunk(mspec, st8, ch, iscal, fscal,
                            deform=False, sample=True)
    pos, vel = _unpack_state_multi(st8, spec, J)
    press = jax.vmap(sacc_press)(sacc) / ns[:, None]
    return E.MDState(pos=pos, vel=vel, h=state_J.h,
                     vxi=jax.vmap(sacc_vxi)(sacc)), press


def sample_stress_fused(runner: FusedRunner, state, n_steps: int, T, dt):
    """engine.sample_stress semantics on the fused kernel."""
    from ..md import engine as E

    spec = runner.spec
    if spec.allpairs:
        dtype = state.pos.dtype
        ch = runner.channels(state.pos, state.h)
        st8 = pack_state(state.pos, state.vel, runner.masses, spec.ftm2v,
                         dtype=dtype)
        # n_steps = 0 neutralized with one dt = 0 step (zero-trip dynamic
        # loops hang Mosaic on hardware — see run_strain_fused)
        n_arr = jnp.asarray(n_steps)
        dt_eff = jnp.where(n_arr > 0, dt, 0.0)
        ns = jnp.maximum(n_arr, 1)
        if runner.kspace_fn is None:
            fscal = make_fscal(dt_eff, T, state.h, vxi=state.vxi,
                               dtype=dtype)
            iscal = make_iscal(ns, 0, 1)
            st8, sacc = fused_chunk(spec, st8, ch, iscal, fscal,
                                    deform=False, sample=True)
            pos, vel = unpack_state(st8, spec.n_atoms)
            press = sacc_press(sacc) / ns
            return E.MDState(pos=pos, vel=vel, h=state.h,
                             vxi=sacc_vxi(sacc)), press
        # kspace split (see run_strain_fused): frozen smooth forces per
        # chunk; their virial joins the pressure accumulator host-side
        Rk = runner.kspace_every
        n_ch = (ns + Rk - 1) // Rk
        hmat = jnp.asarray(state.h, dtype)
        # upper-triangular cell: volume is the diagonal product (the same
        # form the kernel's sampling loop uses)
        vol = hmat[0, 0] * hmat[1, 1] * hmat[2, 2]
        conv = spec.nktv2p / vol

        def chunk(c, carry):
            st8c, vxi, pacc = carry
            g0 = c * Rk
            pos_c, _ = unpack_state(st8c, spec.n_atoms)
            fk = runner.kspace_fn(pos_c, state.h)
            ch_c = {**ch, "fext": pack_fext(fk, spec.n_atoms, dtype)}
            trips = jnp.minimum(ns - g0, Rk).astype(dtype)
            wk = runner.kspace_virial_fn(pos_c, state.h).astype(dtype)
            fscal_c = make_fscal(dt_eff, T, state.h, vxi=vxi, dtype=dtype)
            iscal_c = make_iscal(jnp.minimum(ns - g0, Rk), g0, 1)
            st8c, sacc = fused_chunk(spec, st8c, ch_c, iscal_c, fscal_c,
                                     deform=False, sample=True)
            pacc = pacc + sacc_press(sacc) + trips * wk * conv
            return st8c, sacc_vxi(sacc), pacc

        st8, vxi_end, pacc = jax.lax.fori_loop(
            0, n_ch, chunk,
            (st8, jnp.asarray(state.vxi, dtype), jnp.zeros((6,), dtype)))
        pos, vel = unpack_state(st8, spec.n_atoms)
        press = pacc / ns
        return E.MDState(pos=pos, vel=vel, h=state.h, vxi=vxi_end), press
    R = _chunk_steps(runner.rebuild_every)
    if runner.kspace_fn is not None:
        # both refreshes per chunk at the shorter cadence (see
        # run_strain_fused's list-path branch)
        R = min(R, max(1, int(runner.kspace_every)))
    n_chunks = max(1, n_steps // R)
    dtype = state.pos.dtype
    h = state.h

    hmat = jnp.asarray(h, dtype)
    conv = spec.nktv2p / (hmat[0, 0] * hmat[1, 1] * hmat[2, 2])

    def chunk(carry, _):
        pos, vel, vxi = carry
        ch = runner.channels(pos, h)
        wk = jnp.zeros((6,), dtype)
        if runner.kspace_fn is not None:
            # frozen remainder force per chunk; its virial joins the
            # pressure accumulator here
            fk = runner.kspace_fn(pos, h)
            ch = {**ch, "fext": pack_fext(fk, spec.n_atoms, dtype)}
            wk = runner.kspace_virial_fn(pos, h).astype(dtype)
        st8 = pack_state(pos, vel, runner.masses, spec.ftm2v, dtype=dtype)
        fscal = make_fscal(dt, T, h, vxi=vxi, dtype=dtype)
        iscal = make_iscal(R, 0, 1)
        st8, sacc = fused_chunk(spec, st8, ch, iscal, fscal,
                                deform=False, sample=True)
        pos, vel = unpack_state(st8, spec.n_atoms)
        pacc = sacc_press(sacc) + R * wk * conv
        return (pos, vel, sacc_vxi(sacc)), pacc

    (pos, vel, vxi), accs = jax.lax.scan(
        chunk, (state.pos, state.vel, state.vxi), None, length=n_chunks
    )
    press = jnp.sum(accs, axis=0) / (n_chunks * R)
    return E.MDState(pos=pos, vel=vel, h=h, vxi=vxi), press
