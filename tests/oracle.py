"""Loop-based NumPy golden oracle for every simulation stage.

Each function transliterates the *behavior* of one reference shader
(SURVEY.md §2.4) with explicit per-cell Python loops and scalar math, so it is
maximally independent from the vectorized JAX implementation it validates.
Meant for small grids (<= ~16^3) only.

Conventions (matching the shaders):
  - imageLoad out of bounds returns 0 (INACTIVE / zero velocity / zero
    density).
  - GLSL texture(): normalized u -> texel t = u*N - 0.5, trilinear,
    clamp-to-edge.
  - ivec3(float) casts truncate toward zero.
"""

from __future__ import annotations

import numpy as np

INACTIVE, AIR, WATER, SOLID = 0, 1, 2, 3


# ---------------------------------------------------------------- helpers
def _in(shape, i):
    return all(0 <= i[k] < shape[k] for k in range(3))


def cell_at(types, i):
    return types[tuple(i)] if _in(types.shape, i) else INACTIVE


def vel_at(vel, i):
    """vel is (3,X,Y,Z); OOB reads zero."""
    return (np.array([vel[c][tuple(i)] for c in range(3)])
            if _in(vel.shape[1:], i) else np.zeros(3))


def sample_clamped(field, t):
    """Trilinear clamp-to-edge at texel coords t (3,). Scalar."""
    n = field.shape
    i0 = np.floor(t).astype(int)
    w = t - i0
    acc = 0.0
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                ix = min(max(i0[0] + dx, 0), n[0] - 1)
                iy = min(max(i0[1] + dy, 0), n[1] - 1)
                iz = min(max(i0[2] + dz, 0), n[2] - 1)
                wt = ((w[0] if dx else 1 - w[0])
                      * (w[1] if dy else 1 - w[1])
                      * (w[2] if dz else 1 - w[2]))
                acc += wt * field[ix, iy, iz]
    return acc


def velocity_comp_at(vel, pos, c):
    """texture(vel, (pos + 0.5*e_c)/N)[c] -> texel t = pos - 0.5 + 0.5*e_c."""
    t = np.asarray(pos, dtype=np.float64) - 0.5
    t[c] += 0.5
    return sample_clamped(vel[c], t)


def velocity_vec_at(vel, pos):
    return np.array([velocity_comp_at(vel, pos, c) for c in range(3)])


MOVES = [(1, 0, 0), (0, 1, 0), (0, 0, 1), (-1, 0, 0), (0, -1, 0), (0, 0, -1)]


def _add(i, m):
    return (i[0] + m[0], i[1] + m[1], i[2] + m[2])


# ---------------------------------------------------------------- stages
def init_particles(cfg_pc, res, offset, size):
    """Stage 00 (init_particles.comp:27-49)."""
    pos = np.zeros((cfg_pc, 3), dtype=np.float64)
    active = np.zeros((cfg_pc,), dtype=bool)
    vol = res[0] * res[1] * res[2]
    for i in range(cfg_pc):
        if i < vol:
            x = i % res[0]
            y = (i // res[0]) % res[1]
            z = (i // (res[0] * res[1])) % res[2]
            pos[i] = np.array(offset) + np.array([x, y, z]) / np.array(
                res, dtype=np.float64) * np.array(size)
            active[i] = True
    return pos, active


def histogram(positions, active, grid, scale=1.0):
    """Stages 01/15 (update_densities.comp:29-36)."""
    out = np.zeros(grid, dtype=np.int64)
    for i in range(len(positions)):
        if not active[i]:
            continue
        idx = np.trunc(positions[i] * scale).astype(int)
        if _in(grid, idx):
            out[tuple(idx)] += 1
    return out


def update_water(dens):
    """Stage 02 (update_water.comp:23-34)."""
    out = np.zeros(dens.shape, dtype=np.uint8)
    for i in np.ndindex(dens.shape):
        out[i] = WATER if dens[i] > 0 else INACTIVE
    return out


def update_air(types):
    """Stage 03 (update_active.comp:45-66), race resolved by reading the
    stage-02 input for neighbor water checks."""
    out = types.copy()
    n = types.shape
    for i in np.ndindex(n):
        if (i[0] in (0, n[0] - 1) or i[1] in (0, n[1] - 1)
                or i[2] in (0, n[2] - 1)):
            out[i] = SOLID
        elif types[i] != WATER:
            if any(cell_at(types, _add(i, m)) == WATER for m in MOVES):
                out[i] = AIR
    return out


def compute_extrapolated(old_types, vel):
    """Stage 04 (extrapolated_velocities.comp:37-63)."""
    out = np.zeros_like(vel)
    for i in np.ndindex(old_types.shape):
        c = 0
        v = np.zeros(3)
        for m in MOVES:
            j = _add(i, m)
            if _in(old_types.shape, j) and old_types[j] == WATER:
                v += vel_at(vel, j)
                c += 1
        if c:
            out[:, i[0], i[1], i[2]] = v / c
    return out


def set_extrapolated(old_types, new_types, vel, ext):
    """Stage 05 (extrapolate_velocities.comp:43-109)."""
    def active(t):
        return t in (WATER, AIR)

    out = vel.copy()
    for i in np.ndindex(old_types.shape):
        was_here = active(cell_at(old_types, i))
        is_here = active(cell_at(new_types, i))
        for c in range(3):
            j = list(i)
            j[c] -= 1
            j = tuple(j)
            was = was_here or active(cell_at(old_types, j))
            is_ = is_here or active(cell_at(new_types, j))
            if was and not is_:
                out[c][i] = 0.0
            elif not was and is_:
                out[c][i] = ext[c][i]
    return out


def advect(types, vel, dt):
    """Stage 07 (advect.comp:52-97)."""
    out = vel.copy()
    for i in np.ndindex(types.shape):
        cur_water = cell_at(types, i) == WATER
        for c in range(3):
            up = list(i)
            up[c] += 1  # the reference checks pos - move = pos + e_c
            if i[c] != 0 and (cur_water
                              or cell_at(types, tuple(up)) == WATER):
                fmove = np.full(3, 0.5)
                fmove[c] = 0.0
                pos = np.array(i, dtype=np.float64) + fmove
                cur_v = velocity_vec_at(vel, pos)
                out[c][i] = velocity_comp_at(vel, pos - cur_v * dt, c)
    return out


def forces(types, vel, dt, gravity, fountain_pos, fountain_force):
    """Stage 08 (forces.comp:33-55)."""
    out = vel.copy()
    for i in np.ndindex(types.shape):
        f = 0.0
        wet = (cell_at(types, i) == WATER
               or cell_at(types, _add(i, (0, -1, 0))) == WATER)
        if i[1] != 0 and wet:
            f += gravity
        if i == tuple(fountain_pos) and wet:
            f += fountain_force
        if f != 0.0:
            out[1][i] += dt * f
    return out


def diffuse(types, vel, dt, k, noop=True):
    """Stage 09 (diffuse.comp:31-47).  noop=True reproduces the reference's
    scope-shadowing bug (the stage copies)."""
    if noop:
        return vel.copy()
    out = vel.copy()
    kd = k * dt
    for i in np.ndindex(types.shape):
        if cell_at(types, i) == WATER:
            s = np.zeros(3)
            for m in MOVES:
                s += vel_at(vel, _add(i, m))
            for c in range(3):
                out[c][i] = (1 - 6 * kd) * vel[c][i] + kd * s[c]
    return out


def solids(types, vel, repel):
    """Stage 10 (solids.comp:30-77)."""
    out = vel.copy()
    for i in np.ndindex(types.shape):
        v = np.array([vel[c][i] for c in range(3)])
        if cell_at(types, i) == SOLID:
            for c in range(3):
                if v[c] > -repel:
                    v[c] = -repel
        for c in range(3):
            j = list(i)
            j[c] -= 1
            if cell_at(types, tuple(j)) == SOLID and v[c] < repel:
                v[c] = repel
        for c in range(3):
            out[c][i] = v[c]
    return out


def divergence(vel):
    """Stage 11 (compute_divergence.comp:18-29)."""
    out = np.zeros(vel.shape[1:])
    for i in np.ndindex(out.shape):
        d = 0.0
        for c in range(3):
            up = list(i)
            up[c] += 1
            nb = vel_at(vel, tuple(up))
            d += nb[c] - vel[c][i]
        out[i] = d
    return out


def jacobi(types, div, iters, dt, air_pressure, cell_width, rho):
    """Stage 12 (pressure.comp:52-77), `iters` sweeps from a fresh
    p = air_pressure field.  Returns the final sweep's output."""
    p = np.full(types.shape, air_pressure, dtype=np.float64)
    for _ in range(iters):
        nxt = p.copy()
        for i in np.ndindex(types.shape):
            if types[i] != WATER:
                continue
            aii = 0
            s = div[i] * rho * cell_width / dt
            for m in MOVES:
                t = cell_at(types, _add(i, m))
                if t != SOLID:
                    if t == WATER:
                        s -= p[_add(i, m)] if _in(types.shape, _add(i, m)) \
                            else 0.0
                    else:
                        s -= air_pressure
                    aii += 1
            if aii:
                nxt[i] = -s / aii
        p = nxt
    return p


def fix_divergence(types, pressures, vel, dt, cell_width, rho):
    """Stage 13 (fix_divergence.comp:41-72)."""
    out = vel.copy()
    for i in np.ndindex(types.shape):
        local_t = cell_at(types, i)
        local_p = pressures[i]
        for c in range(3):
            j = list(i)
            j[c] -= 1
            j = tuple(j)
            dv = 0.0
            cur_t = cell_at(types, j)
            if j[c] != -1 and (local_t == WATER or cur_t == WATER):
                if local_t != SOLID and cur_t != SOLID:
                    dv = local_p - pressures[j]
            out[c][i] = vel[c][i] - dt / rho / cell_width * dv
    return out


def move_particles(vel, positions, active, dt):
    """Stage 14 (particles.comp:27-52)."""
    out = positions.copy()
    for i in range(len(positions)):
        if active[i]:
            out[i] = positions[i] + velocity_vec_at(vel, positions[i]) * dt
    return out


def update_inertia(dens, inertia, max_inertia=100, inc_filled=4,
                   req_hits=1, inc_neigh=1, dec=1):
    """Stage 16 (densities_inertia.comp:30-62)."""
    out = inertia.copy()
    for i in np.ndindex(dens.shape):
        old = int(inertia[i])
        val = old
        if dens[i] > 0:
            val += inc_filled
        hits = 0
        for m in MOVES:
            j = _add(i, m)
            if _in(dens.shape, j) and dens[j] > 0:
                hits += 1
        if hits >= req_hits:
            val += hits * inc_neigh
        if val == old:
            val = old - dec if old > dec else 0
        out[i] = min(max_inertia, val)
    return out


def float_densities(inertia, div_coeff=30.0):
    """Stage 17 (float_densities.comp:22-28)."""
    out = np.zeros(inertia.shape, dtype=np.float64)
    for i in np.ndindex(inertia.shape):
        out[i] = -1.0 if inertia[i] == 0 else inertia[i] / div_coeff
    return out


def blur_float_densities(types, f1, f2, steps, k, detail_res):
    """Stage 18 (diffuse_densities.comp:45-63)."""
    f1, f2 = f1.copy(), f2.copy()
    for it in range(steps):
        src, dst = (f1, f2) if it % 2 == 0 else (f2, f1)
        new = dst.copy()
        for i in np.ndindex(f1.shape):
            parent = tuple(i[k] // detail_res for k in range(3))
            if types[parent] == SOLID:
                continue
            s = 0.0
            for m in MOVES:
                j = _add(i, m)
                s += src[j] if _in(f1.shape, j) else 0.0
            new[i] = (1 - 6 * k) * src[i] + k * s
        if it % 2 == 0:
            f2 = new
        else:
            f1 = new
    return f1, f2
