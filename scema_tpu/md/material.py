"""Material initialization: build + equilibrate a replica, measure its
equilibrium length/stress/stiffness/density.

The on-device ``init_material`` executable (init_material.cc,
init_material_problem.h:114-303): the reference minimizes, runs a staged
heatup/cooldown NPT/NVT cycle (in.init.lammps), measures box lengths,
samples the residual stress (ELASTIC homogenization), and probes the 6x6
Voigt stiffness with +/- finite-difference deformations (in.modulus), then
writes init.<mat>_<n>.{length,stress,stiff,bin}.  Here the same pipeline
runs on device and returns arrays; io helpers write the reference-format
text files for interop.
"""
from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import box as B
from . import engine as E
from . import lattice
from . import neighbor as NB
from .forcefields import lj as LJmod
from .forcefields import sw as SWmod
from .homogenization import MDParams, stiffness_probe
from .units import REAL, ATM_TO_PA, UnitSystem

# g/mol per A^3 -> kg/m^3
DENSITY_CONV = 1660.539


@dataclass(frozen=True)
class MaterialSpec:
    """Description of one MD material box (replaces nanoscale_input files)."""

    name: str
    force_field: str = "sw"  # sw | lj | opls
    n_cells: int = 3  # lattice cells per dimension
    # non-cubic cell counts (overrides n_cells); used when seeding the
    # box geometry from a reference LAMMPS binary restart whose lattice
    # is not cubic (init.sic_1.bin is 2x3x4 cells)
    n_cells_xyz: tuple | None = None
    a0: float = 5.431  # lattice parameter (A)
    mass: float = 28.0855  # g/mol
    sw: SWmod.SW = field(default_factory=lambda: SWmod.SI)
    lj_epsilon: float = 0.238
    lj_sigma: float = 3.405
    lj_cutoff: float = 8.0
    # neighbor-list width override; None = per-force-field default
    # (sw 20, lj/opls density-derived).  An explicit value is honored
    # as given — it is NOT clamped down (a user raising it after a
    # width warning must actually get the wider list).
    neighbor_k: int | None = None
    rebuild_every: int = 10
    # opls extras: a LAMMPS data file, or the built-in alkane-melt builder
    data_file: str = ""
    # 64 chains x 8 beads => L ~ 25.8 A at 0.7 g/cm^3, satisfying the
    # minimum-image bound for the 10 A cutoff + skin (the old 27-chain
    # melt's 19.3 A box was smaller than 2x cutoff)
    n_chains: int = 64
    chain_length: int = 8
    opls_lj_cutoff: float = 10.0
    opls_coul_cutoff: float = 9.0  # real-space Coulomb cutoff (in.set.lammps)
    use_ewald: bool = False  # alkanes are uncharged; data files may enable
    # all-atom PE melt (data_io.build_pe_melt_allatom): the reference's
    # actual OPLS material class — charged, H-bearing (in.set.lammps:
    # lj/cut/coul/long + pppm, in.strain.lammps: fix shake m 1.0)
    allatom: bool = False
    pe_density: float = 0.70
    # SHAKE on bonds involving mass-1 atoms; None = auto (on for allatom)
    shake: bool | None = None
    # steps between kspace (PME) re-evaluations on the fused path — the
    # rRESPA outer level (the frozen part is the SMOOTH remainder
    # [Ewald total - plain cut], far slower-varying than LAMMPS respa's
    # frozen recip term)
    kspace_every: int = 10
    # reciprocal-sum backend: 'auto' (dense Ewald below 2048 atoms, PME
    # above — data_io.to_opls), 'ewald', or 'pme'
    kspace: str = "auto"
    # sw extras: fused Pallas brick kernels (ops/sw_pallas.py) — the
    # big-box force path (wins beyond ~10k atoms)
    use_pallas_bricks: bool = False
    # P4 spatial decomposition: shard ONE big SW box's force work into
    # x-slabs over this many devices (the reference's per-job LAMMPS
    # domain decomposition, stmd_problem.h:156,284); 0 = off
    spatial_shards: int = 0
    # setup-time sanity checks (min-image bound, k_max coverage, cell
    # capacity); disable only for deliberately unphysical test fixtures
    validate: bool = True
    # fused Pallas chunk kernel (ops/md_fused.py) for the lj/opls hot
    # loops; None = auto (on for TPU backends, off on CPU where the
    # kernel would run interpreted)
    use_fused: bool | None = None
    # skip the all-pairs mode even when the box fits its VMEM gate, so
    # the gather-list kernel path can be exercised at test-friendly
    # sizes (production leaves this False; the gate picks all-pairs
    # whenever it fits because it is ~10x faster)
    force_list_kernel: bool = False
    # force HBM-streamed neighbor channels on the list kernel at this
    # K-chunk width (test hook; 0 = auto — stream only when the channel
    # set would not fit the kernel's VMEM window, see _build_fused_runner)
    force_k_chunk: int = 0
    # bf16 pair-force tiles on the all-pairs kernel (FusedSpec.pair_bf16):
    # the Newton-reaction XLU transposes move half the bytes; ~0.4%
    # per-pair force rounding, Newton-exact, f32 accumulators.  None =
    # auto (the SCEMA_PAIR_BF16 env var decides — bench A/B hook);
    # True/False pins it.
    pair_bf16: bool | None = None
    # reax extras (force_field="reax"): ffield.reax path, pair_coeff
    # element order (in.set.lammps: `pair_coeff * * ${locf} H C N O`),
    # charge equilibration on/off, bonded-neighbor gather width
    reax_ffield: str = ""
    reax_elements: tuple = ("H", "C", "N", "O")
    qeq: bool = True
    reax_top_k: int = 8
    # "list" = production neighbor-list bond-order field (O(N K), no box
    # cap); "dense" = the O(N^2) reference twin kept as parity anchor
    reax_impl: str = "list"


@dataclass(frozen=True)
class InitData:
    """The reference's per-replica equilibration outputs
    (init.<mat>_<n>.{length,stress,stiff} + density)."""

    length: np.ndarray  # (3,)
    stress: np.ndarray  # (6,) Pa
    stiff: np.ndarray  # (6, 6) Pa
    density: float  # kg/m^3


def _validate_setup(spec: MaterialSpec, pos, h, nspec: NB.NeighborSpec) -> None:
    """Setup-time sanity checks (eager numpy; reference: LAMMPS errors out
    on 'cutoff > half the box' and neighbor-page overflow — here the
    static-shape analogs are checked once at system build).

    1. Minimum-image bound: r_list <= min_height(h)/2 — beyond it the
       single-image neighbor search misses genuine periodic copies.
    2. List width: k_max must hold every neighbor within cutoff + skin/2
       (allowing motion during the rebuild interval).
    3. Cell capacity: the fullest cell must fit the slot grid, else atoms
       silently free-stream with zero force.
    """
    hmin = float(np.min(np.abs(np.diag(np.asarray(h, dtype=float)))))
    if nspec.r_list > 0.5 * hmin:
        raise ValueError(
            f"material {spec.name!r}: neighbor range {nspec.r_list:.2f} A "
            f"violates the minimum-image bound (box min height {hmin:.2f} A); "
            "enlarge the box or reduce the cutoff/skin"
        )
    k_need = NB.max_in_range(pos, h, nspec.cutoff + 0.5 * nspec.skin)
    if nspec.k_max < k_need:
        raise ValueError(
            f"material {spec.name!r}: neighbor list width k_max={nspec.k_max} "
            f"< {k_need} neighbors within cutoff+skin/2 — in-cutoff pairs "
            "would be silently dropped; raise neighbor_k"
        )
    occ = NB.max_cell_occupancy(nspec, pos, h)
    if occ > nspec.cell_capacity:
        raise ValueError(
            f"material {spec.name!r}: fullest cell holds {occ} atoms "
            f"> cell_capacity={nspec.cell_capacity}"
        )



# The builder pins its array work to the host CPU (see build_system), but
# backend-dependent AUTO policies (use_fused, interpret) must reflect the
# SESSION platform, not the temporary placement context.
_SESSION_PLATFORM = None


def _session_platform() -> str:
    global _SESSION_PLATFORM
    if _SESSION_PLATFORM is None:
        _SESSION_PLATFORM = jax.default_backend()
    return _SESSION_PLATFORM

def _build_kspace_split(ff, n: int, dtype):
    """Smooth-remainder Coulomb force/virial for the fused kspace split.

    The fused kernel computes the EXACT weighted real-space Ewald sum
    every step — qq w erfc(a r)/r for r < rc, via FusedSpec.ewald_alpha
    (LAMMPS pair_lj_cut_coul_long's pair expression).  The exact
    Ewald/PME total (opls.OPLSFF.energy's real + recip + self + corr
    decomposition, opls.py:107-141) then differs from the kernel's sum
    by only the genuinely smooth remainder

        e_smooth = recip(pos, h) - sum_excl (1 - wq) qq erf(a r)/r

    (self-energy is position-independent and drops under grad).  The
    excluded-pair correction runs over the SPARSE bonded-topology pair
    list (~3 pairs/atom), not a dense (N, N) field — re-evaluating the
    remainder between fused chunks costs one reciprocal-sum gradient
    plus an O(P) gather, which is what lets kspace_every chunks stay
    cheap (the previous dense-(N,N)-erf remainder cost ~47 ms/eval at
    32 x 1792 atoms and dominated the charged production path).  Force
    is -grad, virial the upper-triangular strain derivative -dE/dF
    (exact for central+mesh forces).
    """
    from . import box as Bx

    ew = ff.ewald
    alpha = float(ew.alpha)
    q = np.asarray(ff.charges, dtype=np.float64)
    excl = np.asarray(ff.excl)  # (N, 3, max), -1 padded
    pi, pj, pw = [], [], []
    for order in range(3):
        wfac = 1.0 - float(ff.special_coul[order])
        if wfac == 0.0:
            continue
        for i in range(n):
            for jx in excl[i, order]:
                if jx > i:  # undirected pairs once (lists are symmetric)
                    pi.append(i)
                    pj.append(int(jx))
                    pw.append(wfac)
    if not pi:  # no excluded pairs: one dead pair keeps shapes static
        pi, pj, pw = [0], [min(1, n - 1)], [0.0]
    ei = jnp.asarray(pi, jnp.int32)
    ej = jnp.asarray(pj, jnp.int32)
    cpair = jnp.asarray(
        float(ew.qqr2e) * np.asarray(pw) * q[pi] * q[pj], dtype)

    def e_smooth(pos, h):
        d = Bx.min_image_disp(h, pos[ej] - pos[ei])
        r = jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)
        corr = -jnp.sum(cpair * jax.scipy.special.erf(alpha * r) / r)
        return ew.reciprocal_energy(pos, h) + corr

    def kspace_fn(pos, h):
        return -jax.grad(e_smooth)(pos, h)

    def kspace_virial_fn(pos, h):
        # W_ab = -dE/dF_ab with F the upper-triangular deformation
        # applied to positions AND the cell (fractionals held fixed)
        def e_of(f6):
            M = jnp.eye(3, dtype=pos.dtype) + jnp.array(
                [[f6[0], f6[3], f6[4]],
                 [0.0, f6[1], f6[5]],
                 [0.0, 0.0, f6[2]]], dtype=pos.dtype)
            return e_smooth(pos @ M.T, M @ h)

        return -jax.grad(e_of)(jnp.zeros(6, dtype=pos.dtype))

    return kspace_fn, kspace_virial_fn


def _build_fused_runner(spec: MaterialSpec, ff, masses, nspec, dtype,
                        cons=None):
    """FusedRunner for lj/opls force fields (ops/md_fused.py), or None.

    Auto policy: fused on TPU-class backends, XLA elsewhere (the Pallas
    kernel only runs interpreted on CPU).  Ewald/kspace systems run the
    all-pairs kernel with the rRESPA kspace split; constraints (SHAKE)
    and all-atom (non-chain) topologies run in-kernel via roll offsets.
    Combinations with no fused mechanism fall back to the XLA path.
    """
    use = spec.use_fused
    if use is None:
        use = _session_platform() != "cpu"
    if not use:
        return None
    from ..ops import md_fused as MFU

    n = int(masses.shape[0])
    topo_ch = None
    bonded = False
    patterns = ()
    pat_rows = None
    coul = False
    qq_table = None
    weights_fn = None
    weights_coul_fn = None
    has_kspace = False
    if hasattr(ff, "topo"):  # OPLS composite
        has_kspace = ff.ewald is not None
        try:
            topo_ch = MFU.pack_topo(ff.topo, ff.bonded, n, dtype=dtype)
            bonded = True
        except ValueError:
            # non-chain topology: the offset-pattern bonded path
            # (all-atom [C H H H] layouts, data_io.build_pe_chain_allatom)
            try:
                patterns, pat_rows = MFU.pack_patterns(
                    ff.topo, ff.bonded, n, dtype=dtype)
            except ValueError:
                return None  # irregular topology: XLA fallback
        eps_table, sig_table, types = ff.lj_epsilon, ff.lj_sigma, ff.types
        cutoff2 = float(ff.lj_cutoff) ** 2
        weights_fn = lambda nbr: ff._pair_weights(nbr, ff.special_lj)
        if bool(jnp.any(jnp.asarray(ff.charges) != 0.0)):
            from .forcefields.coulomb import QQR2E_REAL

            coul = True
            qq_table = jnp.asarray(ff.charges, dtype) * np.sqrt(QQR2E_REAL)
            # Coulomb 1-2/1-3/1-4 scaling is separate from LJ's
            # (special_bonds lj/coul may differ; opls.py:102-106)
            weights_coul_fn = lambda nbr: ff._pair_weights(
                nbr, ff.special_coul)
    elif hasattr(ff, "epsilon") and hasattr(ff, "types"):  # plain LJ
        eps_table, sig_table, types = ff.epsilon, ff.sigma, ff.types
        cutoff2 = float(ff.cutoff) ** 2
    else:
        return None  # SW and others: no fused path yet

    # roll-based SHAKE: constraint partners must sit at small static
    # offsets (guaranteed by the [C H H (H)] all-atom layout)
    shake_offsets = ()
    shk_rows = None
    if cons is not None:
        try:
            shake_offsets, shk_rows = MFU.pack_shake(
                np.asarray(cons.idx), np.asarray(cons.d0), n, dtype=dtype)
        except ValueError:
            return None  # offsets too wide: XLA SHAKE fallback

    n_cons = len(shake_offsets) and int(np.count_nonzero(
        np.asarray(shk_rows).reshape(len(shake_offsets), -1)))
    kspec = MFU.FusedSpec(
        n_atoms=n,
        nt=MFU.pad_n(n) // MFU.LANE,
        k=nspec.k_max,
        cutoff2=cutoff2,
        # fix shake subtracts each rigid bond from the thermostat DOF
        # count (engine.MDSystem.ndof semantics)
        ndof=3 * n - 3 - n_cons,
        boltz=REAL.boltz,
        ftm2v=REAL.ftm2v,
        nktv2p=REAL.nktv2p,
        coul=coul,
        coul_cutoff2=float(getattr(ff, "coul_cutoff", 0.0)) ** 2,
        bonded=bonded,
        bonded_pattern=patterns,
        shake_offsets=shake_offsets,
        fext=has_kspace,
        # kspace systems run the exact weighted erfc real space in-kernel
        # on BOTH pair paths (all-pairs and gather-list); the frozen
        # remainder is only [recip + excluded-pair erf]
        ewald_alpha=float(ff.ewald.alpha) if has_kspace else 0.0,
        interpret=_session_platform() == "cpu",
    )
    packed = _runner_pair_classes(
        n, types, eps_table, sig_table, weights_fn, qq_table, nspec,
        weights_coul_fn=weights_coul_fn,
    )
    pair_cls = lut_w4e = lut_sig2 = lut_qq = None
    if packed is not None:
        pair_cls, lut_w4e, lut_sig2, lut_qq = packed

    # all-pairs mode: dense position-independent parameter matrices ->
    # zero rebuilds, one kernel call per MD run.  The gate is the VMEM
    # budget.  Every plane is symmetric and only the upper block
    # triangle (u >= t, Newton halving) is ever read, so the lj1/lj2
    # (+ qq) parameter planes are triangle-PACKED (ops/md_fused.
    # pack_tri_plane: NBLK = NT(NT+1)/2 blocks of (128, 128) f32) and
    # the 3 min-image cache planes are triangle-packed bf16 (exact —
    # small integers).  Budget model: dense-equivalent plane bytes must
    # fit the kernel's 116 MB scoped-vmem limit divided by the 1.42x
    # calibration factor measured on the round-3 dense layout (compiler
    # double buffering + state/channel blocks) -> 81 MB, i.e. the gate
    # admits ~1792 charged / ~1920 neutral atoms.  Boxes beyond the gate
    # run the gather-list kernel with the SAME in-kernel mechanisms.
    dense_lj1 = dense_lj2 = dense_qq = None
    # Plane layout default: DENSE f32.  The round-5 hardware A/B
    # (scripts/probe_r5_ablations.py, v5e) measured dense FASTER than
    # tri-packed at the clamped gate sizes (+2.6% on 576x512 united-atom,
    # +2.3% on 32x1792 charged) — tri-packing saves VMEM the gate no
    # longer spends (admission is dense-footprint-based, see below), and
    # its unpack indexing costs a few percent.  SCEMA_TRI_PLANES=1 opts
    # back into the packed layout; SCEMA_DENSE_PLANES=1 still forces
    # dense (kept for bench.py's layout-retry hatch).
    tri_packed = (os.environ.get("SCEMA_TRI_PLANES", "") == "1"
                  and os.environ.get("SCEMA_DENSE_PLANES", "") != "1")
    npad = MFU.pad_n(n)
    nt_gate = npad // MFU.LANE
    n_param = 2 + (1 if qq_table is not None else 0)
    # GATE ADMISSION is computed on the DENSE-layout footprint even when
    # tri-packing is on: the round-4 hardware ladder (PLAN_NEXT "HARDWARE
    # gate ladder") measured that although the packed layout is bit-exact
    # and fits the model's budget up to NT~22, Mosaic's register
    # allocator spills ~67 MB above NT=14 and the kernel runs 3x SLOWER
    # than the work ratio — the widened gate was a pessimization, not a
    # lever.  Tri-packing therefore buys VMEM *headroom* below the
    # round-3-calibrated gate (1792 charged / 1920 neutral), not wider
    # admission.
    plane_bytes = (n_param + 3) * npad * npad * 4
    allpairs = (plane_bytes <= 81 * 1024 * 1024
                and not spec.force_list_kernel)
    # boxes beyond the all-pairs VMEM gate run the gather-list kernel
    # with the SAME in-kernel mechanisms: erfc kspace split (remainder
    # rides the rebuild cadence), offset-pattern bonded, roll-SHAKE
    if allpairs:
        ti = np.asarray(types)[:, None]
        tj = np.asarray(types)[None, :]
        eps_m = np.asarray(eps_table)[ti, tj]
        sig_m = np.asarray(sig_table)[ti, tj]
        full = NB.NeighborList(
            idx=jnp.broadcast_to(
                jnp.arange(n, dtype=jnp.int32)[None, :], (n, n)),
            mask=~jnp.eye(n, dtype=bool),
        )
        W = np.ones((n, n))
        if weights_fn is not None:
            W = np.array(weights_fn(full))  # copy: jax arrays are read-only
        np.fill_diagonal(W, 0.0)

        def dense(mat):
            out = np.zeros((npad, npad))
            out[:n, :n] = mat
            # symmetric + upper-triangle-only reads -> triangle-packed
            if tri_packed:
                out = MFU.pack_tri_plane(out, nt_gate)
            return jnp.asarray(out, dtype)

        # LAMMPS pair_lj precomputed force coefficients (pair_lj.cpp's
        # lj1/lj2): F/r = lj1/r^14 - lj2/r^8 — the kernel's 5-op form
        sig6 = sig_m ** 6
        dense_lj1 = dense(48.0 * eps_m * sig6 * sig6 * W)  # lj1
        dense_lj2 = dense(24.0 * eps_m * sig6 * W)        # lj2
        Wq = None
        if qq_table is not None:
            # Coulomb uses ITS OWN special-bond weights (special_coul),
            # matching opls.py:106 — not the LJ weights
            Wq = W if weights_coul_fn is None else np.array(
                weights_coul_fn(full))
            np.fill_diagonal(Wq, 0.0)
            q = np.asarray(qq_table)
            dense_qq = dense(q[:, None] * q[None, :] * Wq)
        pair_bf16 = spec.pair_bf16
        if pair_bf16 is None:
            pair_bf16 = os.environ.get("SCEMA_PAIR_BF16", "") == "1"
        kspec = MFU.FusedSpec(**{**kspec.__dict__, "allpairs": True,
                                 "tri_packed": tri_packed,
                                 "img_bf16": tri_packed,
                                 "pair_bf16": pair_bf16})
    else:
        # gather-list path: stream the (K, NT, 128) channel set from HBM
        # in double-buffered K-chunks when it would not fit the kernel's
        # VMEM window.  The round-4 hardware ladder measured the
        # windowed (whole-channel-resident) form OOM at the FIRST
        # above-all-pairs-gate charged size (K~1112, NT=18: 7 channels
        # x 13 MB sublane-padded + 67 MB spill > 128 MB physical VMEM);
        # streaming removes the ceiling — HBM holds O(N K), VMEM two
        # chunks.  48 MB keeps the hardware-proven resident form at
        # every legacy size.
        kc = spec.force_k_chunk
        n_ch = 6 + (1 if qq_table is not None else 0)
        nt_pad = -(-nt_gate // 8) * 8  # Mosaic sublane padding
        ch_bytes = n_ch * kspec.k * nt_pad * MFU.LANE * 4
        if kc == 0 and ch_bytes > 48 * 1024 * 1024:
            # Size the streamed double buffers from a VMEM budget, not a
            # fixed chunk: the scratch is n_ch x 2 slots x kc x NT_pad x
            # LANE x 4 B, so a constant kc=128 re-approaches the VMEM
            # ceiling as NT grows (~0.92 MB per NT tile at n_ch=7).
            # 24 MB budget against the kernel's 116 MB limit.  History:
            # under a vmap lowered to lax.map, XLA fused the pallas call
            # with its operand slices and charged the kernel's VMEM to
            # the fusion's 16 MB default scoped budget regardless of
            # vmem_limit_bytes (round-5 hardware ladder: NT=35 OOM'd at
            # 19.1 M even with a 9 MB scratch budget — the windows alone
            # scale with NT).  The job vmap therefore UNROLLS
            # (md_fused._unrolled_vmap), each call standing alone with
            # its own 116 MB accounting — kc=128 at NT=18 (22 MB
            # scratch) is hardware-proven in that form.
            budget = 24 * 1024 * 1024
            per_slot = n_ch * 2 * nt_pad * MFU.LANE * 4
            kc = min(128, max(8, (budget // per_slot) // 8 * 8))
        if kc:
            assert n_ch * 2 * kc * nt_pad * MFU.LANE * 4 <= 64 * 1024 * 1024, (
                f"streamed neighbor-channel scratch ({n_ch}ch x 2 x {kc} x "
                f"{nt_pad} x {MFU.LANE} x 4B) exceeds its VMEM share — "
                f"lower force_k_chunk")
            k_pad = -(-kspec.k // kc) * kc  # dead slots carry w4e = 0
            kspec = MFU.FusedSpec(**{**kspec.__dict__, "k": k_pad,
                                     "k_chunk": kc})

    kspace_fn = kspace_virial_fn = None
    if has_kspace:
        kspace_fn, kspace_virial_fn = _build_kspace_split(ff, n, dtype)
    return MFU.FusedRunner(
        spec=kspec,
        nspec=nspec,
        masses=masses,
        eps_table=jnp.asarray(eps_table, dtype),
        sig_table=jnp.asarray(sig_table, dtype),
        types=jnp.asarray(types, jnp.int32),
        rebuild_every=spec.rebuild_every,
        weights_fn=weights_fn,
        weights_coul_fn=weights_coul_fn,
        topo=topo_ch,
        qq_table=qq_table,
        pair_cls=pair_cls,
        lut_w4e=lut_w4e,
        lut_sig2=lut_sig2,
        lut_qq=lut_qq,
        dense_lj1=dense_lj1,
        dense_lj2=dense_lj2,
        dense_qq=dense_qq,
        pat_rows=pat_rows,
        shk_rows=shk_rows,
        kspace_fn=kspace_fn,
        kspace_virial_fn=kspace_virial_fn,
        kspace_every=spec.kspace_every,
    )


def _build_fused_runner_sw(spec: MaterialSpec, swff, masses, nspec, dtype):
    """All-pairs fused-kernel runner for small SW boxes (the HMM per-qp
    regime).  Parameter-free pairs: the kernel closes over the SW
    constants; two tile-pair sweeps per step (moments then adjoint
    forces, ops/md_fused.forces_allpairs_sw)."""
    use = spec.use_fused
    if use is None:
        use = _session_platform() != "cpu"
    n = int(masses.shape[0])
    if not use or n > 640:
        return None
    if not (abs(float(swff.p) - 4.0) < 1e-12 and abs(float(swff.q)) < 1e-12):
        return None  # the kernel hardcodes the p=4/q=0 family (SI etc.)
    from ..ops import md_fused as MFU

    kspec = MFU.FusedSpec(
        n_atoms=n,
        nt=MFU.pad_n(n) // MFU.LANE,
        k=8,
        cutoff2=float(swff.cutoff) ** 2,
        ndof=3 * n - 3,
        boltz=REAL.boltz,
        ftm2v=REAL.ftm2v,
        nktv2p=REAL.nktv2p,
        interpret=_session_platform() == "cpu",
        allpairs=True,
        sw=True,
        sw_params=(float(swff.epsilon), float(swff.sigma), float(swff.a),
                   float(swff.lam), float(swff.gamma),
                   float(swff.costheta0), float(swff.A), float(swff.B)),
    )
    return MFU.FusedRunner(
        spec=kspec,
        nspec=nspec,
        masses=masses,
        eps_table=jnp.zeros((1, 1), dtype),
        sig_table=jnp.zeros((1, 1), dtype),
        types=jnp.zeros((n,), jnp.int32),
        rebuild_every=spec.rebuild_every,
    )


def _runner_pair_classes(n, types, eps_table, sig_table, weights_fn,
                         qq_table, nspec, weights_coul_fn=None):
    """(pair_cls, lut_w4e, lut_sig2, lut_qq) for the packed dense rebuild,
    or None when inapplicable (too many distinct pair parameter combos, or
    the box is outside the dense-rebuild regime).

    Every candidate pair's kernel inputs (4*eps*weight, sigma^2, qq) are
    constant across the run, so they collapse into a <=16-entry LUT whose
    index rides the packed top_k payload (neighbor.build_dense_packed).
    """
    import numpy as np

    if n > min(nspec.n2_threshold, 2048):
        return None  # dense O(N^2) rebuild regime only
    ti = np.asarray(types)[:, None]
    tj = np.asarray(types)[None, :]
    eps = np.asarray(eps_table)[ti, tj]
    sig = np.asarray(sig_table)[ti, tj]
    import jax.numpy as _jnp

    full = NB.NeighborList(
        idx=_jnp.broadcast_to(_jnp.arange(n, dtype=_jnp.int32)[None, :],
                              (n, n)),
        mask=~_jnp.eye(n, dtype=bool),
    )
    W = np.ones((n, n))
    if weights_fn is not None:
        W = np.asarray(weights_fn(full))
    w4e = 4.0 * eps * W
    sig2 = sig * sig
    cols = [w4e.ravel(), sig2.ravel()]
    if qq_table is not None:
        # Coulomb special-bond weights are separate from LJ's (opls.py:106)
        Wq = W if weights_coul_fn is None else np.asarray(
            weights_coul_fn(full))
        q = np.asarray(qq_table)
        cols.append((q[:, None] * q[None, :]).ravel() * Wq.ravel())
    stacked = np.stack(cols, axis=1)
    combos, cls_flat = np.unique(stacked, axis=0, return_inverse=True)
    if combos.shape[0] > 16:
        return None  # payload budget: 4 class bits
    pair_cls = jnp.asarray(cls_flat.reshape(n, n).astype(np.int32))
    lut_qq = combos[:, 2] if qq_table is not None else None
    return pair_cls, combos[:, 0], combos[:, 1], lut_qq


def build_system(spec: MaterialSpec, dtype=jnp.float64) -> tuple[E.MDSystem, E.MDState]:
    # setup-time array work (dense parameter matrices, pair classes,
    # validation scans) is many SMALL ops — on a remote-tunnel backend
    # (axon) each would pay a round trip (measured: 690 s vs 9 s for the
    # 1792-atom charged build).  Pin the builder to the host CPU; the
    # compute path transfers the finished arrays once.
    cpus = None
    if _session_platform() != "cpu":
        try:
            cpus = jax.devices("cpu")
        except RuntimeError:
            cpus = None
    if cpus:
        with jax.default_device(cpus[0]):
            sys_, st = _build_system(spec, dtype)
        # the state is an explicit argument of user jits — move it to the
        # accelerator; everything hanging off MDSystem flows into traces
        # as closure constants and is placed at compile time
        dev = jax.devices()[0]
        st = jax.tree_util.tree_map(lambda x: jax.device_put(x, dev), st)
        return sys_, st
    return _build_system(spec, dtype)


def _build_system(spec: MaterialSpec, dtype=jnp.float64) -> tuple[E.MDSystem, E.MDState]:
    use_onehot = False
    if spec.force_field == "sw":
        cxyz = spec.n_cells_xyz or (spec.n_cells,) * 3
        pos, h = lattice.diamond(spec.a0, *cxyz)
        n = len(pos)
        ff = spec.sw
        cutoff = ff.cutoff
        # SW cutoff spans only the first two diamond shells (16 atoms);
        # 20 slots cover moderate compression
        k_max = spec.neighbor_k if spec.neighbor_k is not None else 20
        # NOTE: the cell-grid path (md/grid.py) is bit-exact but loses to
        # XLA temporary-materialization overhead at these sizes; it stays
        # available as the substrate for a fused Pallas kernel.  Production
        # sizes use the tile-local one-hot structure (neighbor_onehot.py) —
        # but only past the fused all-pairs kernel's 640-atom gate: a
        # 512-640 atom box (e.g. a 4^3-cell diamond lattice) must reach
        # the 16x fused kernel, not the one-hot structure.
        fused_use = spec.use_fused
        if fused_use is None:
            fused_use = _session_platform() != "cpu"
        fused_sw_ok = (
            fused_use and n <= 640 and not spec.use_pallas_bricks
            and abs(float(ff.p) - 4.0) < 1e-12 and abs(float(ff.q)) < 1e-12
        )
        use_onehot = n >= 512 and not fused_sw_ok
    elif spec.force_field == "lj":
        pos, h = lattice.fcc(spec.a0, spec.n_cells, spec.n_cells, spec.n_cells)
        n = len(pos)
        ff = LJmod.single_type(spec.lj_epsilon, spec.lj_sigma, spec.lj_cutoff, n, dtype)
        cutoff = spec.lj_cutoff
        k_max = max(spec.neighbor_k or 32,
                    NB.required_k(n, np.asarray(h), cutoff + 1.0))
        k_max = ((k_max + 7) // 8) * 8
    elif spec.force_field == "opls":
        from . import data_io

        if spec.data_file:
            data = data_io.read_data(spec.data_file)
        elif spec.allatom:
            data = data_io.build_pe_melt_allatom(
                spec.n_chains, spec.chain_length, density=spec.pe_density)
        else:
            data = data_io.build_alkane_melt(spec.n_chains, spec.chain_length)
        ff = data_io.to_opls(
            data, lj_cutoff=spec.opls_lj_cutoff,
            coul_cutoff=spec.opls_coul_cutoff,
            use_ewald=spec.use_ewald, dtype=dtype, kspace=spec.kspace,
        )
        n = len(data.pos)
        cutoff = ff.cutoff
        # fix shake ... m 1.0 (in.strain.lammps): bonds involving mass-1
        # atoms held rigid at the bond style's r0
        cons = None
        shake_on = spec.shake if spec.shake is not None else spec.allatom
        if shake_on:
            from . import constraints as CN

            mt = data.masses[data.types]
            b = np.asarray(data.bonds)
            sel = (mt[b[:, 0]] < 1.5) | (mt[b[:, 1]] < 1.5)
            if bool(sel.any()):
                d0 = np.asarray(data.bond_coeffs)[
                    np.asarray(data.bond_types)[sel], 1]
                cons = CN.from_bonds(jnp.asarray(b[sel], jnp.int32),
                                     jnp.asarray(d0, dtype))
        # size the list from density, not a constant: the default melt has
        # ~134 neighbors within the 10 A cutoff — a 96-wide list silently
        # drops in-cutoff pairs (wrong LJ/Coulomb stresses)
        k_max = max(spec.neighbor_k or 32,
                    NB.required_k(n, data.box, cutoff + 1.0))
        k_max = ((k_max + 7) // 8) * 8  # sublane-aligned for the fused path
        nspec = NB.derive_spec(n, data.box, cutoff=cutoff, skin=1.0, k_max=k_max)
        if spec.validate:
            _validate_setup(spec, data.pos, data.box, nspec)
        masses = jnp.asarray(data.masses[data.types], dtype=dtype)
        fused = _build_fused_runner(spec, ff, masses, nspec, dtype,
                                    cons=cons)
        sys = E.MDSystem(
            ff=ff,
            masses=masses,
            nspec=nspec,
            units=REAL,
            rebuild_every=spec.rebuild_every,
            constraints=cons,
            fused=fused,
        )
        st = E.init_state(jnp.asarray(data.pos, dtype=dtype),
                          jnp.asarray(data.box, dtype=dtype))
        return sys, st
    elif spec.force_field == "reax":
        # pair_style reax/c + fix qeq/reax (lammps_scripts_reax/
        # in.set.lammps:13-15) — the neighbor-list bond-order field
        # (forcefields/reax.ReaxFFList; reax_impl="dense" keeps the
        # O(N^2) parity twin).  Structures come from the same builders
        # as OPLS: a LAMMPS data file (atom_style charge) or the
        # all-atom PE melt; element identity is inferred from masses.
        from . import data_io
        from .forcefields.reax import build_reax

        if spec.data_file:
            data = data_io.read_data(spec.data_file)
        else:
            data = data_io.build_pe_melt_allatom(
                spec.n_chains, spec.chain_length, density=spec.pe_density)
        n = len(data.pos)
        if spec.reax_impl == "dense" and n > 2048:
            raise ValueError(
                f"reax box has {n} atoms; the dense bond-order field is "
                "sized for the HMM per-qp regime (<= 2048) — use the "
                "default reax_impl='list'")
        if not spec.reax_ffield:
            raise ValueError(
                "force_field='reax' needs reax_ffield (path to a "
                "ffield.reax parameter file)")
        masses_np = data.masses[data.types]
        ff = build_reax(
            spec.reax_ffield, list(spec.reax_elements), masses_np,
            dtype=dtype, top_k=spec.reax_top_k, qeq=spec.qeq,
            impl=spec.reax_impl)
        cutoff = ff.cutoff
        # the list field consumes the engine neighbor list directly:
        # size K to cover every pair inside the taper radius (hbond's
        # 7.5 A and the ~5 A bond region are subsets of swb = 10 A)
        k_need = NB.required_k(n, np.asarray(data.box, float),
                               cutoff + 1.0)
        nspec = NB.derive_spec(n, data.box, cutoff=cutoff, skin=1.0,
                               k_max=min(k_need, max(n - 1, 1)))
        if spec.validate:
            # the dense field needs no neighbor list — only the
            # minimum-image bound applies (taper cutoff < half box)
            hmin = float(np.min(np.abs(np.diag(np.asarray(
                data.box, dtype=float)))))
            if cutoff > 0.5 * hmin:
                raise ValueError(
                    f"material {spec.name!r}: reax taper cutoff "
                    f"{cutoff:.1f} A violates the minimum-image bound "
                    f"(box min height {hmin:.2f} A)")
        sys = E.MDSystem(
            ff=ff,
            masses=jnp.asarray(masses_np, dtype=dtype),
            nspec=nspec,
            units=REAL,
            rebuild_every=spec.rebuild_every,
        )
        st = E.init_state(jnp.asarray(data.pos, dtype=dtype),
                          jnp.asarray(data.box, dtype=dtype))
        return sys, st
    else:
        raise NotImplementedError(
            f"force field {spec.force_field!r} is not implemented"
        )
    nspec = NB.derive_spec(n, np.asarray(h), cutoff=cutoff, skin=1.0, k_max=k_max)
    if spec.validate:
        _validate_setup(spec, np.asarray(pos), np.asarray(h), nspec)
    if spec.force_field == "sw" and spec.use_pallas_bricks:
        from ..ops.sw_pallas import SWBricksFF

        ff = SWBricksFF(ff, np.asarray(pos), np.asarray(h))
        sys = E.MDSystem(
            ff=ff,
            masses=jnp.full((n,), spec.mass, dtype=dtype),
            nspec=nspec,
            units=REAL,
            rebuild_every=spec.rebuild_every,
        )
        return sys, E.init_state(jnp.asarray(pos, dtype=dtype),
                                 jnp.asarray(h, dtype=dtype))
    ohspec = None
    if use_onehot:
        from . import neighbor_onehot as OH

        density = n / float(np.prod(np.diag(np.asarray(h))))
        perm = OH.spatial_sort(np.asarray(pos), np.asarray(h),
                               brick=(128.0 / density) ** (1.0 / 3.0))
        pos = np.asarray(pos)[perm]
        ohspec = OH.derive_onehot_spec(n, np.asarray(h), cutoff=cutoff,
                                       skin=1.0, k=k_max)
        ff = OH.SWOneHot(sw=ff, spec=ohspec)
    masses = jnp.full((n,), spec.mass, dtype=dtype)
    fused = None
    if spec.force_field == "lj":
        fused = _build_fused_runner(spec, ff, masses, nspec, dtype)
    elif spec.force_field == "sw" and not use_onehot:
        fused = _build_fused_runner_sw(spec, spec.sw, masses, nspec, dtype)
    spatial = None
    if spec.spatial_shards > 0:
        if spec.force_field != "sw":
            raise ValueError("spatial_shards: only SW boxes have a "
                             "sharded force path (P4)")
        from jax.sharding import Mesh
        from ..parallel import spatial_md as SP

        k = spec.spatial_shards
        devs = jax.devices()
        if len(devs) < k:
            raise ValueError(
                f"spatial_shards={k} but only {len(devs)} devices")
        sg = SP.derive_sharded_grid(n, np.asarray(h), cutoff=cutoff,
                                    skin=0.5, n_shards=k)
        spatial = SP.SpatialRunner(
            sg=sg, mesh=Mesh(np.array(devs[:k]), ("md",)))
        fused = None  # the sharded loop owns the force path
    sys = E.MDSystem(
        ff=ff,
        masses=masses,
        nspec=nspec,
        units=REAL,
        rebuild_every=spec.rebuild_every,
        onehot=ohspec,
        fused=fused,
        spatial=spatial,
    )
    st = E.init_state(jnp.asarray(pos, dtype=dtype), jnp.asarray(h, dtype=dtype))
    return sys, st


def equilibrate(
    sys: E.MDSystem,
    state: E.MDState,
    params: MDParams,
    key,
    minimize_steps: int = 100,
    equil_steps: int = 200,
) -> E.MDState:
    """Minimize then thermalize (the in.init.lammps prep, simplified: the
    staged NPT heatup/cooldown cycle becomes FIRE + NVT at the target
    temperature; box stays at the lattice volume)."""
    # dt0 is force-field-aware: stiff reactive fields declare a smaller
    # stable FIRE step (forcefields/reax.py fire_dt0)
    state = jax.jit(lambda s: E.minimize_fire(
        sys, s, n_steps=minimize_steps,
        dt0=getattr(sys.ff, "fire_dt0", 0.5)))(state)
    vel = E.maxwell_velocities(sys, key, max(params.temperature, 1e-6),
                               dtype=state.pos.dtype)
    state = state._replace(vel=vel)
    if equil_steps > 0:
        state = jax.jit(
            lambda s: E.run_nvt(sys, s, equil_steps, params.temperature, params.dt)
        )(state)
    return state


def equilibrate_staged(
    sys: E.MDSystem,
    state: E.MDState,
    params: MDParams,
    key,
    ns_init: int = 100,
    minimize_steps: int = 100,
) -> E.MDState:
    """The reference's full heatup/cooldown material-prep cycle
    (in.init.lammps): minimize -> NVT@300 -> NPT 300->500 -> NPT@500 (5x)
    -> NPT 500->T -> NPT@T (2x), isotropic 1 atm barostat.  ``ns_init``
    scales all stage lengths like the script's ``nsinit``."""
    T = params.temperature
    dt = params.dt
    state = E.minimize_fire(sys, state, n_steps=minimize_steps,
                            dt0=getattr(sys.ff, "fire_dt0", 0.5))
    state = state._replace(
        vel=E.maxwell_velocities(sys, key, 200.0, dtype=state.pos.dtype)
    )
    state = E.run_nvt(sys, state, ns_init, 300.0, dt)
    state = E.run_npt(sys, state, ns_init, 300.0, 500.0, dt)
    state = E.run_npt(sys, state, 5 * ns_init, 500.0, 500.0, dt)
    state = E.run_npt(sys, state, ns_init, 500.0, T, dt)
    state = E.run_npt(sys, state, 2 * ns_init, T, T, dt)
    return state


def make_measure_fn(sys: E.MDSystem, params: MDParams,
                    thermal_stiffness: bool = False):
    """Jitted core of :func:`measure`.  Build ONCE per (system, params)
    and reuse across replicas — jitting fresh lambdas per call (the old
    behavior) recompiled the sampling + 12-probe stiffness program for
    every replica, paying the full XLA compile repeatedly."""

    @jax.jit
    def _measure(state):
        st2, press = E.sample_stress(sys, state, params.nsteps_sample,
                                     params.temperature, params.dt)
        C = stiffness_probe(sys, st2, params, thermal=thermal_stiffness)
        return press, C

    return _measure


def measure(
    sys: E.MDSystem,
    state: E.MDState,
    params: MDParams,
    thermal_stiffness: bool = False,
    measure_fn=None,
) -> InitData:
    """Measure equilibrium box lengths, residual stress, stiffness, density
    (init_material_problem.h:192-295).  Pass a :func:`make_measure_fn`
    result as ``measure_fn`` when measuring several replicas."""
    L, _ = B.lengths_tilts(state.h)
    fn = measure_fn or make_measure_fn(sys, params, thermal_stiffness)
    press, C = fn(state)
    stress = -press * ATM_TO_PA
    vol = float(B.volume(state.h))
    density = float(jnp.sum(sys.masses)) * DENSITY_CONV / vol
    return InitData(
        length=np.asarray(L),
        stress=np.asarray(stress),
        stiff=np.asarray(C),
        density=density,
    )


def write_init_files(outdir: str, name: str, replica: int, data: InitData) -> None:
    """Reference-format init.<mat>_<n>.{length,stress,stiff} text files
    (read_write.h formats; density file is written per material by
    average_replica_data, stmd_sync.h:477-487)."""
    from ..utils import io_tensors as io
    import os

    os.makedirs(outdir, exist_ok=True)
    base = f"{outdir}/init.{name}_{replica}"
    io.write_vector(base + ".length", data.length)
    io.write_sym2(base + ".stress", _voigt_to_sym_np(data.stress))
    io.write_sym4(base + ".stiff", _c66_to_rank4_np(data.stiff))


def _voigt_to_sym_np(v):
    t = np.zeros((3, 3))
    pairs = ((0, 0), (1, 1), (2, 2), (0, 1), (0, 2), (1, 2))
    for k, (i, j) in enumerate(pairs):
        t[i, j] = v[k]
        t[j, i] = v[k]
    return t


def _c66_to_rank4_np(c66):
    from ..utils import tensors as T

    return np.asarray(T.c66_to_rank4(jnp.asarray(c66)))
