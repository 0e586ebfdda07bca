"""Pallas TPU kernel prototype: fused Stillinger-Weber energy + 3-body
moments over 128-atom tile pairs.

This is the round-2 performance centerpiece (PLAN_NEXT.md) in prototype
form: all pair math fused in VMEM — no HBM temporaries, no gathers.  Atoms
are spatially sorted (neighbor_onehot.spatial_sort) so tiles are compact
bricks; for boxes under ~4k atoms every tile pair runs (O(N^2) tiles); for
larger boxes the same kernel takes a per-tile neighbor-tile list.

The kernel emits, per atom: the two-body energy row sum and the 3-body
moment set (s, gsq, m(3), Q(6)) — 11 channels.  The three-body energy
follows from the exact moment reduction (forcefields/sw.py).  Forward
only for now; the backward (force) kernel lands with custom_vjp in
round 2 — this prototype exists to pin the achievable step time.

Layout: positions as (T, 8, 128) tiles — sublanes [x, y, z, occ, 0...],
lanes = atoms.  Output moments (T, 16, 128) (11 used, padded to 16
sublanes).
"""
from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128
NCHAN = 16  # output channels (sublane-padded)


def pack_tiles(pos: jax.Array, n_valid: int) -> jax.Array:
    """(N, 3) -> (T, 8, 128) tile layout with occupancy channel."""
    n = pos.shape[0]
    n_pad = ((n + TILE - 1) // TILE) * TILE
    x = jnp.pad(pos, ((0, n_pad - n), (0, 0)))
    occ = (jnp.arange(n_pad) < n_valid).astype(pos.dtype)
    rows = jnp.concatenate([x.T, occ[None, :]], axis=0)  # (4, n_pad)
    rows = jnp.pad(rows, ((0, 8 - rows.shape[0]), (0, 0)))  # (8, n_pad)
    return rows.reshape(8, n_pad // TILE, TILE).transpose(1, 0, 2)


def _sw_kernel(params_ref, hrow_ref, a_ref, b_ref, out_ref):
    """Tile-pair program: centers = tile i (lanes), neighbors = tile j."""
    j = pl.program_id(1)
    n_j = pl.num_programs(1)

    (eps, sig, a_cut, lam, gam, c0, A, B_, p_, q_) = [
        params_ref[0, k] for k in range(10)
    ]
    rc = a_cut * sig
    # orthorhombic box rows (Lx, Ly, Lz) — triclinic arrives in round 2
    Lx, Ly, Lz = hrow_ref[0, 0], hrow_ref[0, 1], hrow_ref[0, 2]

    ax, ay, az, aocc = (a_ref[0, 0, :], a_ref[0, 1, :], a_ref[0, 2, :],
                        a_ref[0, 3, :])
    bx, by, bz, bocc = (b_ref[0, 0, :], b_ref[0, 1, :], b_ref[0, 2, :],
                        b_ref[0, 3, :])

    # pair displacements (centers i = sublane axis, neighbors j = lane axis)
    def mi(d, L):
        return d - L * jnp.round(d / L)

    dx = mi(bx[None, :] - ax[:, None], Lx)
    dy = mi(by[None, :] - ay[:, None], Ly)
    dz = mi(bz[None, :] - az[:, None], Lz)
    r2 = dx * dx + dy * dy + dz * dz

    same_tile = pl.program_id(0) == j
    eye = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) == (
        jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
    )
    mask = (
        (aocc[:, None] > 0.5)
        & (bocc[None, :] > 0.5)
        & (r2 < (rc - 1e-6) ** 2)
        & ~(same_tile & eye)
    )
    r = jnp.sqrt(jnp.where(mask, r2, 1.0))

    sr = sig / r
    sr2 = sr * sr
    srp = sr2 * sr2  # p = 4 for Si; general p via exp/log avoided
    expo = jnp.exp(sig / jnp.where(mask, r - rc, -1.0))
    e2 = jnp.where(mask, A * eps * (B_ * srp - 1.0 * (sr**q_)) * expo, 0.0)

    g = jnp.where(mask, jnp.exp(gam * sig / jnp.where(mask, r - rc, -1.0)), 0.0)
    ux, uy, uz = dx / r, dy / r, dz / r
    gux, guy, guz = g * ux, g * uy, g * uz

    # per-center (sublane-axis) reductions over neighbors (lane axis)
    def rs(v):
        return jnp.sum(v, axis=1)

    acc = jnp.stack(
        [
            0.5 * rs(e2),  # 0: half two-body
            rs(g),  # 1: s
            rs(g * g),  # 2: gsq
            rs(gux), rs(guy), rs(guz),  # 3-5: m
            rs(gux * ux), rs(guy * uy), rs(guz * uz),  # 6-8: Q diag
            rs(gux * uy), rs(gux * uz), rs(guy * uz),  # 9-11: Q offdiag
        ],
        axis=0,
    )  # (12, TILE)
    acc = jnp.pad(acc, ((0, NCHAN - acc.shape[0]), (0, 0)))[None]

    @pl.when(j == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] = out_ref[:] + acc


def sw_moments_pallas(sw, pos: jax.Array, h: jax.Array, n_valid: int,
                      interpret: bool = False) -> jax.Array:
    """All-tile-pairs SW pass: returns per-atom channels (N_pad_channels).

    Output (T, NCHAN, TILE): [e2_half, s, gsq, m(3), Qxx, Qyy, Qzz,
    Qxy, Qxz, Qyz] per atom.
    """
    tiles = pack_tiles(pos, n_valid)  # (T, 8, 128)
    T = tiles.shape[0]
    params = jnp.asarray(
        [[sw.epsilon, sw.sigma, sw.a, sw.lam, sw.gamma, sw.costheta0,
          sw.A, sw.B, sw.p, sw.q, 0.0, 0.0]],
        dtype=pos.dtype,
    )
    hrow = jnp.asarray([[h[0, 0], h[1, 1], h[2, 2], 0.0]], dtype=pos.dtype)

    out = pl.pallas_call(
        _sw_kernel,
        out_shape=jax.ShapeDtypeStruct((T, NCHAN, TILE), pos.dtype),
        grid=(T, T),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 8, TILE), lambda i, j: (j, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NCHAN, TILE), lambda i, j: (i, 0, 0)),
        interpret=interpret,
    )(params, hrow, tiles, tiles)
    return out


def sw_energy_from_moments(sw, moments: jax.Array) -> jax.Array:
    """Total SW energy from the kernel's per-atom channels."""
    T = moments.shape[0]
    ch = moments.reshape(T, NCHAN, TILE)
    e2 = jnp.sum(ch[:, 0])
    s = ch[:, 1]
    gsq = ch[:, 2]
    m2 = ch[:, 3] ** 2 + ch[:, 4] ** 2 + ch[:, 5] ** 2
    trq2 = (
        ch[:, 6] ** 2 + ch[:, 7] ** 2 + ch[:, 8] ** 2
        + 2.0 * (ch[:, 9] ** 2 + ch[:, 10] ** 2 + ch[:, 11] ** 2)
    )
    c0 = sw.costheta0
    e3_atom = (trq2 - gsq) - 2.0 * c0 * (m2 - gsq) + c0 * c0 * (s * s - gsq)
    return e2 + 0.5 * sw.lam * sw.epsilon * jnp.sum(e3_atom)


def sw_energy_pallas(sw, pos, h, n_valid=None, interpret=False):
    if n_valid is None:
        n_valid = pos.shape[0]
    return sw_energy_from_moments(
        sw, sw_moments_pallas(sw, pos, h, n_valid, interpret=interpret)
    )


# --------------------------------------------------------------------------
# Tile-adjacency variant: grid (T, MAXNB) with the neighbor-tile id list
# scalar-prefetched, so only spatially adjacent tile pairs are computed —
# the production path for boxes beyond a few thousand atoms.


def tile_adjacency(pos: np.ndarray, h: np.ndarray, cutoff: float,
                   skin: float = 1.0, max_nb: int | None = None):
    """Neighbor-tile lists from tile bounding spheres (host, at rebuild).

    Row k=0 is always the tile itself; invalid slots repeat self with
    valid=0.  Returns (nbr (T, MAXNB) int32, valid (T, MAXNB) int32).
    """
    pos = np.asarray(pos)
    n = len(pos)
    n_pad = ((n + TILE - 1) // TILE) * TILE
    x = np.concatenate([pos, np.repeat(pos[-1:], n_pad - n, axis=0)], axis=0)
    tiles = x.reshape(-1, TILE, 3)
    centers = tiles.mean(axis=1)
    radii = np.linalg.norm(tiles - centers[:, None, :], axis=-1).max(axis=1)
    L = np.array([h[0, 0], h[1, 1], h[2, 2]])
    d = centers[:, None, :] - centers[None, :, :]
    d -= np.round(d / L) * L
    dist = np.linalg.norm(d, axis=-1)
    reach = radii[:, None] + radii[None, :] + cutoff + skin
    adj = dist < reach
    T = len(centers)
    counts = adj.sum(axis=1)
    if max_nb is None:
        max_nb = int(counts.max())
    nbr = np.zeros((T, max_nb), dtype=np.int32)
    valid = np.zeros((T, max_nb), dtype=np.int32)
    for i in range(T):
        lst = [i] + [j for j in np.where(adj[i])[0] if j != i]
        lst = lst[:max_nb]
        nbr[i, : len(lst)] = lst
        nbr[i, len(lst):] = i
        valid[i, : len(lst)] = 1
    return nbr, valid


def _sw_kernel_adj(nbr_ref, val_ref, params_ref, hrow_ref, a_ref, b_ref, out_ref):
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(val_ref[i, k] == 1)
    def _():
        (eps, sig, a_cut, lam, gam, c0, A, B_, p_, q_) = [
            params_ref[0, kk] for kk in range(10)
        ]
        rc = a_cut * sig
        Lx, Ly, Lz = hrow_ref[0, 0], hrow_ref[0, 1], hrow_ref[0, 2]
        ax, ay, az, aocc = (a_ref[0, 0, :], a_ref[0, 1, :], a_ref[0, 2, :],
                            a_ref[0, 3, :])
        bx, by, bz, bocc = (b_ref[0, 0, :], b_ref[0, 1, :], b_ref[0, 2, :],
                            b_ref[0, 3, :])

        def mi(dv, L):
            return dv - L * jnp.round(dv / L)

        dx = mi(bx[None, :] - ax[:, None], Lx)
        dy = mi(by[None, :] - ay[:, None], Ly)
        dz = mi(bz[None, :] - az[:, None], Lz)
        r2 = dx * dx + dy * dy + dz * dz
        same_tile = nbr_ref[i, k] == i
        eye = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) == (
            jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        )
        mask = (
            (aocc[:, None] > 0.5)
            & (bocc[None, :] > 0.5)
            & (r2 < (rc - 1e-6) ** 2)
            & ~(same_tile & eye)
        )
        r = jnp.sqrt(jnp.where(mask, r2, 1.0))
        sr = sig / r
        sr2 = sr * sr
        srp = sr2 * sr2
        expo = jnp.exp(sig / jnp.where(mask, r - rc, -1.0))
        e2 = jnp.where(mask, A * eps * (B_ * srp - 1.0) * expo, 0.0)
        g = jnp.where(mask, jnp.exp(gam * sig / jnp.where(mask, r - rc, -1.0)), 0.0)
        ux, uy, uz = dx / r, dy / r, dz / r
        gux, guy, guz = g * ux, g * uy, g * uz

        def rs(v):
            return jnp.sum(v, axis=1)

        acc = jnp.stack(
            [
                0.5 * rs(e2), rs(g), rs(g * g),
                rs(gux), rs(guy), rs(guz),
                rs(gux * ux), rs(guy * uy), rs(guz * uz),
                rs(gux * uy), rs(gux * uz), rs(guy * uz),
            ],
            axis=0,
        )
        acc = jnp.pad(acc, ((0, NCHAN - acc.shape[0]), (0, 0)))[None]
        out_ref[:] = out_ref[:] + acc


def sw_moments_pallas_adj(sw, pos, h, nbr, valid, n_valid=None,
                          interpret=False):
    """Adjacency-subsetted SW pass (q=0 force fields, e.g. Si).

    nbr/valid: (T, MAXNB) from tile_adjacency.
    """
    if n_valid is None:
        n_valid = pos.shape[0]
    tiles = pack_tiles(pos, n_valid)
    T = tiles.shape[0]
    max_nb = nbr.shape[1]
    params = jnp.asarray(
        [[sw.epsilon, sw.sigma, sw.a, sw.lam, sw.gamma, sw.costheta0,
          sw.A, sw.B, sw.p, sw.q, 0.0, 0.0]],
        dtype=pos.dtype,
    )
    hrow = jnp.asarray([[h[0, 0], h[1, 1], h[2, 2], 0.0]], dtype=pos.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T, max_nb),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i, k, nbr_r, val_r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, k, nbr_r, val_r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE), lambda i, k, nbr_r, val_r: (i, 0, 0)),
            pl.BlockSpec((1, 8, TILE),
                         lambda i, k, nbr_r, val_r: (nbr_r[i, k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NCHAN, TILE),
                               lambda i, k, nbr_r, val_r: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _sw_kernel_adj,
        out_shape=jax.ShapeDtypeStruct((T, NCHAN, TILE), pos.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(nbr), jnp.asarray(valid), params, hrow, tiles, tiles)
    return out


def sw_energy_pallas_adj(sw, pos, h, nbr, valid, interpret=False):
    return sw_energy_from_moments(
        sw, sw_moments_pallas_adj(sw, pos, h, nbr, valid, interpret=interpret)
    )


# --------------------------------------------------------------------------
# Brick-aligned tiles: one tile = one spatial brick padded to 128 lanes,
# adjacency = the exact 27-stencil on the brick grid — fixes the loose
# bounding-sphere adjacency of consecutive-atom tiles.


def brick_structure(pos: np.ndarray, h: np.ndarray, cutoff: float,
                    skin: float = 1.0, target_occ: int = 96):
    """Brick grid + 27-stencil adjacency (host, at rebuild).

    Returns (slot_ids (C, 128) int32 atom ids with n=len(pos) padding,
    nbr (C, 27) int32, valid (C, 27) int32).  Brick edge >= cutoff+skin
    and sized for ~target_occ atoms; bricks with more than 128 atoms
    would drop entries (edge is chosen to prevent it).
    """
    pos = np.asarray(pos)
    n = len(pos)
    L = np.array([h[0, 0], h[1, 1], h[2, 2]])
    density = n / float(np.prod(L))
    edge = max(cutoff + skin, (target_occ / density) ** (1.0 / 3.0))
    nc = np.maximum(1, np.floor(L / edge).astype(int))

    while True:
        c1, c2, c3 = int(nc[0]), int(nc[1]), int(nc[2])
        C = c1 * c2 * c3
        s = pos @ np.linalg.inv(h).T
        s -= np.floor(s)
        bxyz = np.minimum((s * nc).astype(int), nc - 1)
        bid = (bxyz[:, 0] * c2 + bxyz[:, 1]) * c3 + bxyz[:, 2]
        slot_ids = np.full((C, TILE), n, dtype=np.int32)
        fill = np.zeros(C, dtype=int)
        overflow = False
        for a in np.argsort(bid, kind="stable"):
            b = bid[a]
            if fill[b] < TILE:
                slot_ids[b, fill[b]] = a
                fill[b] += 1
            else:
                overflow = True
                break
        if not overflow:
            break
        # refine along the largest-edge axes while they still fit the cutoff
        grew = False
        for d in np.argsort(-L / nc):
            if L[d] / (nc[d] + 1) >= cutoff + skin:
                nc[d] += 1
                grew = True
                break
        if not grew:
            raise ValueError(
                "brick overflow: box too small for 128-lane bricks at this "
                "cutoff — use the all-pairs kernel"
            )

    idx = np.arange(C)
    iz = idx % c3
    iy = (idx // c3) % c2
    ix = idx // (c2 * c3)
    offsets = [(0, 0, 0)] + [
        (i, j, k)
        for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
        if (i, j, k) != (0, 0, 0)
    ]
    nbr = np.zeros((C, 27), dtype=np.int32)
    seen = [set() for _ in range(C)]
    valid = np.zeros((C, 27), dtype=np.int32)
    for o, (dx_, dy_, dz_) in enumerate(offsets):
        tgt = ((ix + dx_) % c1) * c2 * c3 + ((iy + dy_) % c2) * c3 + (iz + dz_) % c3
        for c in range(C):
            t = int(tgt[c])
            if t in seen[c]:
                nbr[c, o] = c
                valid[c, o] = 0  # duplicate wrap (grids < 3 cells per axis)
            else:
                seen[c].add(t)
                nbr[c, o] = t
                valid[c, o] = 1
    return slot_ids, nbr, valid


def pack_bricks(pos: jax.Array, slot_ids: np.ndarray) -> jax.Array:
    """(N, 3) + (C, 128) slots -> (C, 8, 128) tiles with occupancy."""
    n = pos.shape[0]
    pos_pad = jnp.concatenate([pos, jnp.zeros((1, 3), pos.dtype)], axis=0)
    sl = jnp.asarray(slot_ids)
    g = pos_pad[sl]  # (C, 128, 3)
    occ = (sl < n).astype(pos.dtype)  # (C, 128)
    rows = jnp.concatenate(
        [jnp.transpose(g, (0, 2, 1)), occ[:, None, :]], axis=1
    )  # (C, 4, 128)
    return jnp.pad(rows, ((0, 0), (0, 4), (0, 0)))


def _sw_force_kernel(nbr_ref, val_ref, params_ref, hrow_ref,
                     a_ref, b_ref, aj_ref, bj_ref, out_ref):
    """Force accumulation per (a, b) tile pair.

    For each ordered pair the energy contribution is
      T = 0.5 phi2(r) + g [A_s + A_gsq g + A_m.u + u^T A_Q u]
    with A_* the center atom's three-body adjoints (computed outside from
    the moment channels).  w = dT/dd gives F_center += w, F_neighbor -= w;
    this program accumulates both roles of tile a: centers vs b, and
    neighbors of b's centers.
    """
    i = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    @pl.when(val_ref[i, k] == 1)
    def _():
        (eps, sig, a_cut, lam, gam, c0, A, B_, p_, q_) = [
            params_ref[0, kk] for kk in range(10)
        ]
        rc = a_cut * sig
        Lx, Ly, Lz = hrow_ref[0, 0], hrow_ref[0, 1], hrow_ref[0, 2]

        def rows(ref):
            return ref[0, 0, :], ref[0, 1, :], ref[0, 2, :], ref[0, 3, :]

        ax, ay, az, aocc = rows(a_ref)
        bx, by, bz, bocc = rows(b_ref)

        def mi(dv, L):
            return dv - L * jnp.round(dv / L)

        same_tile = nbr_ref[i, k] == i
        eye = jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0) == (
            jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        )

        def pair_w(cx, cy, cz, cocc, nx, ny, nz, nocc, adj_ref):
            """w vectors for (center=sublane, neighbor=lane) pairs."""
            dx = mi(nx[None, :] - cx[:, None], Lx)
            dy = mi(ny[None, :] - cy[:, None], Ly)
            dz = mi(nz[None, :] - cz[:, None], Lz)
            r2 = dx * dx + dy * dy + dz * dz
            mask = (
                (cocc[:, None] > 0.5) & (nocc[None, :] > 0.5)
                & (r2 < (rc - 1e-6) ** 2) & ~(same_tile & eye)
            )
            r = jnp.sqrt(jnp.where(mask, r2, 1.0))
            inv_r = 1.0 / r
            ux, uy, uz = dx * inv_r, dy * inv_r, dz * inv_r
            denom = jnp.where(mask, r - rc, -1.0)
            expo = jnp.exp(sig / denom)
            sr = sig * inv_r
            sr2 = sr * sr
            srp = sr2 * sr2
            phi2 = A * eps * (B_ * srp - 1.0) * expo
            dphi2 = (
                A * eps * (-4.0 * B_ * srp * inv_r) * expo
                + phi2 * (-sig / (denom * denom))
            )
            g = jnp.exp(gam * sig / denom)
            dg = g * (-gam * sig / (denom * denom))

            # center adjoints broadcast over lanes
            A_s = adj_ref[0, 12, :][:, None]
            A_gsq = adj_ref[0, 13, :][:, None]
            Amx = adj_ref[0, 3, :][:, None]
            Amy = adj_ref[0, 4, :][:, None]
            Amz = adj_ref[0, 5, :][:, None]
            Qxx = adj_ref[0, 6, :][:, None]
            Qyy = adj_ref[0, 7, :][:, None]
            Qzz = adj_ref[0, 8, :][:, None]
            Qxy = adj_ref[0, 9, :][:, None]
            Qxz = adj_ref[0, 10, :][:, None]
            Qyz = adj_ref[0, 11, :][:, None]

            am_u = Amx * ux + Amy * uy + Amz * uz
            Qu_x = Qxx * ux + Qxy * uy + Qxz * uz
            Qu_y = Qxy * ux + Qyy * uy + Qyz * uz
            Qu_z = Qxz * ux + Qyz * uy + Qzz * uz
            uQu = ux * Qu_x + uy * Qu_y + uz * Qu_z

            radial = 0.5 * dphi2 + dg * (A_s + 2.0 * A_gsq * g + am_u + uQu)
            tang = g * inv_r
            wx = radial * ux + tang * (Amx + 2.0 * Qu_x - (am_u + 2.0 * uQu) * ux)
            wy = radial * uy + tang * (Amy + 2.0 * Qu_y - (am_u + 2.0 * uQu) * uy)
            wz = radial * uz + tang * (Amz + 2.0 * Qu_z - (am_u + 2.0 * uQu) * uz)
            z = jnp.zeros_like(wx)
            return (jnp.where(mask, wx, z), jnp.where(mask, wy, z),
                    jnp.where(mask, wz, z),
                    (jnp.where(mask, dx, z), jnp.where(mask, dy, z),
                     jnp.where(mask, dz, z)))

        # role 1: a centers vs b neighbors -> F_a += sum_lanes w.
        # This role also enumerates every ordered pair exactly once, so it
        # accumulates the per-pair virial sum w (x) d as 6 extra channels
        # (W = -sym(sum) outside).
        w1x, w1y, w1z, d1 = pair_w(ax, ay, az, aocc, bx, by, bz, bocc, aj_ref)
        # role 2: b centers vs a neighbors -> F_a -= sum_sublanes w'
        w2x, w2y, w2z, _ = pair_w(bx, by, bz, bocc, ax, ay, az, aocc, bj_ref)

        fx = jnp.sum(w1x, axis=1) - jnp.sum(w2x, axis=0)
        fy = jnp.sum(w1y, axis=1) - jnp.sum(w2y, axis=0)
        fz = jnp.sum(w1z, axis=1) - jnp.sum(w2z, axis=0)
        dx1, dy1, dz1 = d1
        wd = [
            jnp.sum(w1x * dx1, axis=1),
            jnp.sum(w1y * dy1, axis=1),
            jnp.sum(w1z * dz1, axis=1),
            0.5 * jnp.sum(w1x * dy1 + w1y * dx1, axis=1),
            0.5 * jnp.sum(w1x * dz1 + w1z * dx1, axis=1),
            0.5 * jnp.sum(w1y * dz1 + w1z * dy1, axis=1),
        ]
        acc = jnp.stack([fx, fy, fz] + wd, axis=0)
        acc = jnp.pad(acc, ((0, NCHAN - acc.shape[0]), (0, 0)))[None]
        out_ref[:] = out_ref[:] + acc


def sw_forces_pallas_bricks(sw, pos, h, slot_ids, nbr, valid,
                            interpret=False):
    """SW forces on the brick structure (q=0 force fields).

    Two fused passes: moments (energy kernel), then the force kernel with
    per-atom adjoint channels.  Returns (F (N, 3), E total).
    """
    moments = sw_moments_pallas_bricks_raw(sw, pos, h, slot_ids, nbr, valid,
                                           interpret=interpret)
    C = moments.shape[0]
    lam_eps = sw.lam * sw.epsilon
    c0 = sw.costheta0
    # adjoint channels appended in slots 12 (A_s) and 13 (A_gsq); m/Q
    # channels 3..11 scaled into adjoints in place
    s = moments[:, 1]
    adj = moments
    adj = adj.at[:, 12].set(lam_eps * c0 * c0 * s)
    adj = adj.at[:, 13].set(-(lam_eps / 2.0) * (1.0 - c0) ** 2
                            * jnp.ones_like(s))
    adj = adj.at[:, 3:6].set(-2.0 * lam_eps * c0 * moments[:, 3:6])
    adj = adj.at[:, 6:12].set(lam_eps * moments[:, 6:12])

    tiles = pack_bricks(pos, slot_ids)
    params = jnp.asarray(
        [[sw.epsilon, sw.sigma, sw.a, sw.lam, sw.gamma, sw.costheta0,
          sw.A, sw.B, sw.p, sw.q, 0.0, 0.0]],
        dtype=pos.dtype,
    )
    hrow = jnp.asarray([[h[0, 0], h[1, 1], h[2, 2], 0.0]], dtype=pos.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, nbr.shape[1]),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i, k, n_, v_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, k, n_, v_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE), lambda i, k, n_, v_: (i, 0, 0)),
            pl.BlockSpec((1, 8, TILE), lambda i, k, n_, v_: (n_[i, k], 0, 0)),
            pl.BlockSpec((1, NCHAN, TILE), lambda i, k, n_, v_: (i, 0, 0)),
            pl.BlockSpec((1, NCHAN, TILE), lambda i, k, n_, v_: (n_[i, k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NCHAN, TILE), lambda i, k, n_, v_: (i, 0, 0)),
    )
    fout = pl.pallas_call(
        _sw_force_kernel,
        out_shape=jax.ShapeDtypeStruct((C, NCHAN, TILE), pos.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(nbr), jnp.asarray(valid), params, hrow, tiles, tiles,
      adj, adj)

    # scatter slot forces back to atom order
    n = pos.shape[0]
    f_slots = jnp.transpose(fout[:, :3, :], (0, 2, 1)).reshape(-1, 3)
    ids = jnp.asarray(slot_ids).reshape(-1)
    F = jnp.zeros((n + 1, 3), dtype=pos.dtype).at[ids].add(f_slots)[:n]
    energy = sw_energy_from_moments(sw, moments)
    # potential virial W_ab = -sym(sum_pairs w (x) d) (engine convention)
    wd = jnp.sum(fout[:, 3:9, :], axis=(0, 2))  # (6,) [xx,yy,zz,xy,xz,yz]
    W = -jnp.asarray(
        [[wd[0], wd[3], wd[4]], [wd[3], wd[1], wd[5]], [wd[4], wd[5], wd[2]]]
    )
    return F, energy, W


class SWBricksFF:
    """Engine-pluggable SW force field backed by the Pallas brick kernels.

    The brick structure (slot assignment + 27-stencil adjacency) is built
    host-side once and is affine-invariant (binning uses fractional
    coordinates), so fix-deform box changes never invalidate it; thermal
    drift across brick boundaries is bounded by the brick margin for
    solid-state runs (periodic host rebuilds arrive with the round-2
    engine integration of longer trajectories).

    Provides energy / forces / forces_energy_virial so md/engine.py can
    dispatch to the fused kernels instead of autodiff.
    """

    def __init__(self, sw, pos0, h0, skin: float = 1.0, target_occ: int = 96):
        import numpy as np

        self.sw = sw
        self.cutoff = sw.cutoff
        slots, nbr, valid = brick_structure(
            np.asarray(pos0), np.asarray(h0), sw.cutoff, skin=skin,
            target_occ=target_occ,
        )
        self.slot_ids = slots
        self.nbr = nbr
        self.valid = valid

    def energy(self, pos, h, nbrstruct=None):
        return sw_energy_pallas_bricks(
            self.sw, pos, h, self.slot_ids, self.nbr, self.valid
        )

    def forces(self, pos, h, nbrstruct=None):
        F, _, _ = sw_forces_pallas_bricks(
            self.sw, pos, h, self.slot_ids, self.nbr, self.valid
        )
        return F

    def forces_energy_virial(self, pos, h, nbrstruct=None):
        return sw_forces_pallas_bricks(
            self.sw, pos, h, self.slot_ids, self.nbr, self.valid
        )


def sw_moments_pallas_bricks_raw(sw, pos, h, slot_ids, nbr, valid,
                                 interpret=False):
    tiles = pack_bricks(pos, slot_ids)
    C = tiles.shape[0]
    params = jnp.asarray(
        [[sw.epsilon, sw.sigma, sw.a, sw.lam, sw.gamma, sw.costheta0,
          sw.A, sw.B, sw.p, sw.q, 0.0, 0.0]],
        dtype=pos.dtype,
    )
    hrow = jnp.asarray([[h[0, 0], h[1, 1], h[2, 2], 0.0]], dtype=pos.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, nbr.shape[1]),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i, k, n_, v_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, k, n_, v_: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE), lambda i, k, n_, v_: (i, 0, 0)),
            pl.BlockSpec((1, 8, TILE), lambda i, k, n_, v_: (n_[i, k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NCHAN, TILE), lambda i, k, n_, v_: (i, 0, 0)),
    )
    return pl.pallas_call(
        _sw_kernel_adj,
        out_shape=jax.ShapeDtypeStruct((C, NCHAN, TILE), pos.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(nbr), jnp.asarray(valid), params, hrow, tiles, tiles)


def sw_energy_pallas_bricks(sw, pos, h, slot_ids, nbr, valid, interpret=False):
    """Brick-tiled SW energy (q=0 force fields)."""
    tiles = pack_bricks(pos, slot_ids)
    C = tiles.shape[0]
    params = jnp.asarray(
        [[sw.epsilon, sw.sigma, sw.a, sw.lam, sw.gamma, sw.costheta0,
          sw.A, sw.B, sw.p, sw.q, 0.0, 0.0]],
        dtype=pos.dtype,
    )
    hrow = jnp.asarray([[h[0, 0], h[1, 1], h[2, 2], 0.0]], dtype=pos.dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(C, nbr.shape[1]),
        in_specs=[
            pl.BlockSpec((1, 12), lambda i, k, nbr_r, val_r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 4), lambda i, k, nbr_r, val_r: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 8, TILE), lambda i, k, nbr_r, val_r: (i, 0, 0)),
            pl.BlockSpec((1, 8, TILE),
                         lambda i, k, nbr_r, val_r: (nbr_r[i, k], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, NCHAN, TILE),
                               lambda i, k, nbr_r, val_r: (i, 0, 0)),
    )
    out = pl.pallas_call(
        _sw_kernel_adj,
        out_shape=jax.ShapeDtypeStruct((C, NCHAN, TILE), pos.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(nbr), jnp.asarray(valid), params, hrow, tiles, tiles)
    return sw_energy_from_moments(sw, out)
