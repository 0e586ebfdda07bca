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
    interpret: bool = False


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

    def gather3(px, py, pz, idx_t):
        """Gather 3 position channels for one center tile's slot indices."""
        gx = jnp.zeros((K, LANE), px.dtype)
        gy = jnp.zeros((K, LANE), px.dtype)
        gz = jnp.zeros((K, LANE), px.dtype)
        tile_of = idx_t >> 7
        lane_of = jnp.bitwise_and(idx_t, LANE - 1)
        for p in range(P):
            sel = tile_of == p
            gx = jnp.where(sel, jnp.take_along_axis(
                jnp.broadcast_to(px[p][None, :], (K, LANE)), lane_of, axis=1), gx)
            gy = jnp.where(sel, jnp.take_along_axis(
                jnp.broadcast_to(py[p][None, :], (K, LANE)), lane_of, axis=1), gy)
            gz = jnp.where(sel, jnp.take_along_axis(
                jnp.broadcast_to(pz[p][None, :], (K, LANE)), lane_of, axis=1), gz)
        return gx, gy, gz

    def kernel(iscal_ref, fscal_ref, state_ref, idx_ref, w4e_ref, sig2_ref,
               imx_ref, imy_ref, imz_ref, qq_ref,
               state_out, sacc_ref):
        dtype = state_ref.dtype
        n_run = iscal_ref[0, _I_NRUN]
        gstep0 = iscal_ref[0, _I_GSTEP0]
        n_tot = iscal_ref[0, _I_NTOT]
        dt = fscal_ref[0, _F_DT]
        T = fscal_ref[0, _F_T]
        h0 = tuple(fscal_ref[0, _F_H0 + i] for i in range(6))
        eps = tuple(fscal_ref[0, _F_EPS + i] for i in range(6))

        invm = state_ref[0, 6]  # ftm2v/m, (NT, LANE)
        mftm = state_ref[0, 7]  # m/ftm2v

        def h_of(g):
            if not deform:
                return h0
            frac = g.astype(dtype) / n_tot.astype(dtype)
            return _h_at(h0, eps, frac)

        def forces(px, py, pz, h6):
            """Pair forces + (optionally) per-step pair virial (Voigt-6)."""
            lx, ly, lz, xy, xz, yz = h6
            fxs, fys, fzs = [], [], []
            w6 = [jnp.zeros((), dtype) for _ in range(6)]
            for t in range(NT):
                idx_t = idx_ref[0, :, t, :]
                w4e = w4e_ref[0, :, t, :]
                sig2 = sig2_ref[0, :, t, :]
                nx = imx_ref[0, :, t, :]
                ny = imy_ref[0, :, t, :]
                nz = imz_ref[0, :, t, :]
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
                    qq = qq_ref[0, :, t, :]
                    livec = (r2 < spec.coul_cutoff2) & (r2 > spec.r2min)
                    inv_r = jax.lax.rsqrt(r2c)
                    fpair = fpair + jnp.where(livec, qq * inv_r * inv_r2, 0.0)
                fxs.append(-jnp.sum(fpair * dx, axis=0))
                fys.append(-jnp.sum(fpair * dy, axis=0))
                fzs.append(-jnp.sum(fpair * dz, axis=0))
                if sample:
                    # pair virial sum w (x) d; full list double-counts -> 0.5
                    w6[0] += 0.5 * jnp.sum(fpair * dx * dx)
                    w6[1] += 0.5 * jnp.sum(fpair * dy * dy)
                    w6[2] += 0.5 * jnp.sum(fpair * dz * dz)
                    w6[3] += 0.5 * jnp.sum(fpair * dx * dy)
                    w6[4] += 0.5 * jnp.sum(fpair * dx * dz)
                    w6[5] += 0.5 * jnp.sum(fpair * dy * dz)
            return jnp.stack(fxs), jnp.stack(fys), jnp.stack(fzs), w6

        def nhc_half(vx, vy, vz, vxi):
            """Exact scalar twin of engine._nhc_half."""
            kt = kb * T
            q0 = spec.ndof * kt * spec.tdamp**2
            q = [q0] + [kt * spec.tdamp**2] * (NHC_LEN - 1)
            dt2, dt4, dt8 = dt / 2.0, dt / 4.0, dt / 8.0
            ke2 = jnp.sum(mftm * (vx * vx + vy * vy + vz * vz))

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
        px = state_ref[0, 0]
        py = state_ref[0, 1]
        pz = state_ref[0, 2]
        vx = state_ref[0, 3]
        vy = state_ref[0, 4]
        vz = state_ref[0, 5]
        vxi0 = tuple(fscal_ref[0, _F_VXI + i] for i in range(NHC_LEN))

        fx0, fy0, fz0, _ = forces(px, py, pz, h_of(gstep0))
        pacc0 = tuple(jnp.zeros((), dtype) for _ in range(6))

        def step(s, carry):
            (px, py, pz, vx, vy, vz, fx, fy, fz, vxi, pacc) = carry
            g_now = gstep0 + s
            h_now = h_of(g_now)
            if thermostat:
                vx, vy, vz, vxi = nhc_half(vx, vy, vz, vxi)
            half = 0.5 * dt
            vx = vx + half * fx * invm
            vy = vy + half * fy * invm
            vz = vz + half * fz * invm
            px = px + dt * vx
            py = py + dt * vy
            pz = pz + dt * vz
            fx, fy, fz, w6 = forces(px, py, pz, h_now)
            vx = vx + half * fx * invm
            vy = vy + half * fy * invm
            vz = vz + half * fz * invm
            if thermostat:
                vx, vy, vz, vxi = nhc_half(vx, vy, vz, vxi)
            if sample:
                vol = h_now[0] * h_now[1] * h_now[2]
                conv = nktv2p / vol
                kxx = jnp.sum(mftm * vx * vx)
                kyy = jnp.sum(mftm * vy * vy)
                kzz = jnp.sum(mftm * vz * vz)
                kxy = jnp.sum(mftm * vx * vy)
                kxz = jnp.sum(mftm * vx * vz)
                kyz = jnp.sum(mftm * vy * vz)
                kin = (kxx, kyy, kzz, kxy, kxz, kyz)
                pacc = tuple(
                    pacc[i] + (kin[i] + w6[i]) * conv for i in range(6)
                )
            if deform:
                h_new = h_of(g_now + 1)
                a00, a01, a02, a11, a12, a22 = _remap_coeffs(h_now, h_new)
                px = a00 * px + a01 * py + a02 * pz
                py = a11 * py + a12 * pz
                pz = a22 * pz
            return (px, py, pz, vx, vy, vz, fx, fy, fz, vxi, pacc)

        carry = (px, py, pz, vx, vy, vz, fx0, fy0, fz0, vxi0, pacc0)
        carry = jax.lax.fori_loop(0, n_run, step, carry)
        (px, py, pz, vx, vy, vz, fx, fy, fz, vxi, pacc) = carry

        state_out[0, 0] = px
        state_out[0, 1] = py
        state_out[0, 2] = pz
        state_out[0, 3] = vx
        state_out[0, 4] = vy
        state_out[0, 5] = vz
        state_out[0, 6] = invm
        state_out[0, 7] = mftm
        for i in range(NHC_LEN):
            sacc_ref[0, _S_VXI + i] = vxi[i]
        for i in range(6):
            sacc_ref[0, _S_PRESS + i] = pacc[i]
        ke2 = jnp.sum(mftm * (vx * vx + vy * vy + vz * vz))
        sacc_ref[0, _S_KE2] = ke2
        for i in range(_S_KE2 + 1, _SACC):
            sacc_ref[0, i] = jnp.zeros((), dtype)

    return kernel


@partial(jax.jit, static_argnames=("spec", "deform", "sample", "thermostat"))
def fused_chunk(spec: FusedSpec, state, channels, iscal, fscal,
                deform=True, sample=False, thermostat=True):
    """Run one fused chunk.

    state: (8, NT, 128); channels: dict with idx/w4e/sig2/imx/imy/imz[/qq]
    each (K, NT, 128); iscal: (ISCAL,) int32; fscal: (FSCAL,) float.
    Returns (state', sacc (SACC,)).
    """
    NT, K = spec.nt, spec.k
    dtype = state.dtype
    kern = _make_kernel(spec, deform, sample, thermostat)
    qq = channels.get("qq")
    if qq is None:
        qq = jnp.zeros((1, 1, 1), dtype)  # placeholder, never read
        qq_spec = pl.BlockSpec((1, 1, 1), lambda: (0, 0, 0),
                               memory_space=pl.ANY)
    else:
        qq_spec = pl.BlockSpec((1, K, NT, LANE), lambda: (0, 0, 0, 0))
        qq = qq[None]

    nbr_spec = pl.BlockSpec((1, K, NT, LANE), lambda: (0, 0, 0, 0))
    out = pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((1, 8, NT, LANE), dtype),
            jax.ShapeDtypeStruct((1, _SACC), dtype),
        ),
        in_specs=[
            pl.BlockSpec((1, _ISCAL), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _FSCAL), lambda: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, NT, LANE), lambda: (0, 0, 0, 0)),
            nbr_spec,  # idx
            nbr_spec,  # w4e
            nbr_spec,  # sig2
            nbr_spec,  # imx
            nbr_spec,  # imy
            nbr_spec,  # imz
            qq_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, 8, NT, LANE), lambda: (0, 0, 0, 0)),
            pl.BlockSpec((1, _SACC), lambda: (0, 0), memory_space=pltpu.SMEM),
        ),
        interpret=spec.interpret,
    )(
        iscal[None], fscal[None], state[None],
        channels["idx"][None], channels["w4e"][None], channels["sig2"][None],
        channels["imx"][None], channels["imy"][None], channels["imz"][None],
        qq,
    )
    st, sacc = out
    return st[0], sacc[0]


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


def unpack_state(state, n):
    """(8, NT, 128) -> (pos (N,3), vel (N,3))."""
    flat = state.reshape(8, -1)[:, :n]
    pos = jnp.stack([flat[0], flat[1], flat[2]], axis=-1)
    vel = jnp.stack([flat[3], flat[4], flat[5]], axis=-1)
    return pos, vel


def pack_channels(pos, h, nbr: NB.NeighborList, eps_pair, sig_pair,
                  weights=None, qq_pair=None, dtype=None):
    """Neighbor channels from a built list.

    eps_pair/sig_pair/weights/qq_pair: (N, K) per-slot values (already
    type-resolved).  Returns dict of (K, NT, 128) channels; invalid slots
    carry w4e = 0 and image 0.
    """
    dtype = dtype or pos.dtype
    n, k = nbr.idx.shape
    npad = pad_n(n)
    NT = npad // LANE

    # periodic images: n_ij = -round(inv_h (pos_j - pos_i)) so that
    # d = pos_j + h n_ij - pos_i is the minimum image (exact under any
    # later affine deform — fractional coordinates are held fixed)
    disp = pos[nbr.idx] - pos[:, None, :]
    s = jnp.einsum("ab,nkb->nka", B.inv_h(h), disp)
    img = -jnp.round(s)

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
        "imx": ch(img[..., 0]),
        "imy": ch(img[..., 1]),
        "imz": ch(img[..., 2]),
    }
    if qq_pair is not None:
        out["qq"] = ch(qq_pair * w)
    return out


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
