"""Tetrahedral FEM plant at reference mesh scale — the SOFA replacement.

The reference simulates the robots with SOFA's C++ ``TetrahedronFEMForceField``
(method='large') + implicit Euler + Rayleigh damping over the shipped meshes
(robots/environments.py:139-238: Diamond diamond.vtu 1628 nodes / 9768-dim
state; :39-137: Trunk trunk.vtk 709 nodes / 4254-dim), actuated by
``CableConstraint`` cables barycentrically mapped into the mesh, with the base
fixed by a BoxROI + stiff springs.

This module is the TPU-native equivalent, designed for XLA rather than a
translation of SOFA:

- **Corotational elasticity, like SOFA's method='large'**: per-element
  rotations R_e from the deformation gradient (batched Higham polar Newton
  iterations — 3x3 inverses only, no SVD), force f_e = -R_e K_e (R_e^T x_e -
  x_e^rest) with the precomputed (E,12,12) rest element stiffnesses K_e. All
  element work is batched einsums over every element at once.
- **One factorization, ever — per-step solves by rotated-preconditioner
  PCG**: implicit Euler needs (M + dt*D + dt^2*K_t(q)) dv = dt*(f - dt*K_t v)
  with the *current* corotational tangent K_t = sum_e R_e K_e R_e^T (SPD by
  construction). Instead of re-factorizing (SOFA re-runs sparse LDL every
  step), the system is solved matrix-free with PCG: the K_t matvec is a
  batched gather -> rotate -> (E,12,12)@(E,12) -> rotate -> scatter sweep, and
  the preconditioner is S0^{-1} = (M + dt*D + dt^2*K0)^{-1} applied in
  per-node rotated frames, P = R_n S0^{-1} R_n^T (R_n = polar of the
  volume-weighted average of adjacent element rotations) — SPD, and it tracks
  the tangent so well that even a fully folded Trunk converges in a few tens
  of iterations while near-rest states converge in a handful. S0^{-1} is
  stored as an eigendecomposition, so applying it is two dense matmuls on
  the MXU — a triangular Cholesky solve sequentializes on TPU and measured
  ~100x slower per step. NOTE: a constant-factor fixed-point/quasi-Newton
  scheme is *not* usable here — with stiffness contrasts k_max/k_min ~ 1e8
  the iteration map exceeds spectral radius 1 for milliradian element
  rotations.
- **Matrix-free reduced Jacobians**: the TPWL pipeline never materializes the
  (2n x 2n) state Jacobian (763 MB at Diamond scale). ``reduced_affine_dynamics``
  computes U^T K_t U through r jvp's of the element force sweep — the role of
  the reference's LDL text export + extract_AB (sofacontrol/utils.py:180-299)
  at a tiny fraction of the cost.

Units follow the SOFA scenes: mm, kg, s => force in mN, stress in kPa
(gravity -9810 mm/s^2, youngModulus 175/450 as-is, u in mN — matching
examples/hardware/model.py:28-45 and robots/environments.py:141-146).
"""

from __future__ import annotations

import os
import re
import warnings
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.packing import qv2x, x2qv

REFERENCE_MESH_DIR = "/root/reference/robots/mesh"

# TPU matmul/einsum default precision is bf16; the element-stiffness
# contractions and the preconditioner matmuls need f32 accumulation
# (bf16-rounded forces destabilize the implicit solve), so every
# matmul-like contraction in this module pins HIGHEST precision.
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Mesh IO


def load_vtu_ascii(path: str):
    """Parse an ASCII XML .vtu (UnstructuredGrid) into (points (n,3) f64,
    tets (E,4) i32). Covers the shipped diamond.vtu; keeps only tetrahedra
    (VTK cell type 10)."""
    txt = open(path).read()

    def _block(name_attr: str) -> np.ndarray:
        m = re.search(name_attr + r'"[^>]*>(.*?)</DataArray>', txt, re.S)
        if m is None:
            raise ValueError(f"missing DataArray {name_attr} in {path}")
        return np.array(m.group(1).split(), dtype=np.float64)

    pts = _block(r'NumberOfComponents="3" format="ascii').reshape(-1, 3)
    conn = _block(r'Name="connectivity" format="ascii').astype(np.int64)
    offs = _block(r'Name="offsets" format="ascii').astype(np.int64)
    types = _block(r'Name="types" format="ascii').astype(np.int64)
    cells, start = [], 0
    for off, typ in zip(offs, types):
        if typ == 10 and off - start == 4:
            cells.append(conn[start:off])
        start = off
    return pts, np.asarray(cells, dtype=np.int32)


def load_vtk_legacy(path: str):
    """Parse a legacy-format .vtk (ASCII or BINARY big-endian, as written by
    Gmsh for the shipped trunk.vtk / finger.vtk) into (points, tets)."""
    raw = open(path, "rb").read()
    binary = b"\nBINARY" in raw[:200] or raw.splitlines()[2].strip() == b"BINARY"

    def _find_line(key: bytes, from_pos: int = 0):
        i = raw.index(key, from_pos)
        j = raw.index(b"\n", i)
        return raw[i:j].decode(), j + 1

    hdr, data_pos = _find_line(b"POINTS")
    n_pts = int(hdr.split()[1])
    pt_dtype = ">f8" if hdr.split()[2] == "double" else ">f4"
    if binary:
        nb = n_pts * 3 * np.dtype(pt_dtype).itemsize
        pts = np.frombuffer(raw[data_pos:data_pos + nb], dtype=pt_dtype)
        after = data_pos + nb
    else:
        cells_at = raw.index(b"CELLS", data_pos)
        pts = np.array(raw[data_pos:cells_at].split(), dtype=np.float64)
        after = cells_at
    pts = pts.astype(np.float64).reshape(n_pts, 3)

    hdr, data_pos = _find_line(b"CELLS", after)
    n_cells, sz = int(hdr.split()[1]), int(hdr.split()[2])
    if binary:
        nb = sz * 4
        cell_data = np.frombuffer(raw[data_pos:data_pos + nb], dtype=">i4")
        after = data_pos + nb
    else:
        types_at = raw.index(b"CELL_TYPES", data_pos)
        cell_data = np.array(raw[data_pos:types_at].split(), dtype=np.int64)
        after = types_at
    hdr, data_pos = _find_line(b"CELL_TYPES", after)
    if binary:
        types = np.frombuffer(raw[data_pos:data_pos + n_cells * 4], dtype=">i4")
    else:
        types = np.array(raw[data_pos:data_pos + 32 * n_cells].split()[:n_cells],
                         dtype=np.int64)
    cells, k = [], 0
    for c in range(n_cells):
        cnt = int(cell_data[k])
        if types[c] == 10 and cnt == 4:
            cells.append(cell_data[k + 1:k + 5])
        k += cnt + 1
    return pts, np.asarray(cells, dtype=np.int32)


def transform_mesh(points: np.ndarray, rotation_deg=(0.0, 0.0, 0.0),
                   translation=(0.0, 0.0, 0.0)) -> np.ndarray:
    """Apply the SOFA loader's Euler-XYZ rotation (degrees) + translation
    (robots/environments.py:149-155: Diamond rotation=[90,0,0],
    translation=[0,0,35])."""
    rx, ry, rz = [np.deg2rad(a) for a in rotation_deg]

    def rot_x(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[1, 0, 0], [0, c, -s], [0, s, c]])

    def rot_y(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])

    def rot_z(a):
        c, s = np.cos(a), np.sin(a)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])

    R = rot_z(rz) @ rot_y(ry) @ rot_x(rx)
    return points @ R.T + np.asarray(translation)


# ---------------------------------------------------------------------------
# Element kernels (batched over all elements)


def _tet_precompute(points: np.ndarray, tets: np.ndarray):
    """Rest shape-matrix inverses Dm^-1 (E,3,3) and volumes (E,). Elements
    with non-positive volume are reoriented (vertex swap)."""
    tets = np.asarray(tets).copy()
    p = points[tets]  # (E,4,3)
    Dm = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]],
                  axis=-1)  # (E,3,3) columns = edges
    det = np.linalg.det(Dm)
    flip = det < 0
    if flip.any():  # reorient so volumes are positive
        tets[flip, 2], tets[flip, 3] = tets[flip, 3].copy(), tets[flip, 2].copy()
        p = points[tets]
        Dm = np.stack([p[:, 1] - p[:, 0], p[:, 2] - p[:, 0], p[:, 3] - p[:, 0]],
                      axis=-1)
        det = np.linalg.det(Dm)
    vol = det / 6.0
    keep = vol > 1e-12
    return tets[keep], np.linalg.inv(Dm[keep]), vol[keep]


def _polar_rotations(F, iters: int = 10):
    """Batched rotation factors of (E,3,3) deformation gradients via the
    Higham Newton iteration X <- (X + X^-T)/2 — only batched 3x3 inverses,
    no SVD/eigendecomposition, fully differentiable and TPU-friendly."""
    X = F

    def body(X, _):
        Xinv_t = jnp.swapaxes(jnp.linalg.inv(X), -1, -2)
        return 0.5 * (X + Xinv_t), None

    X, _ = jax.lax.scan(body, X, None, length=iters)
    return X


def _linear_element_forces(pos_e, Bm, vol, mu, lam):
    """Linear-elasticity nodal forces for all elements (small-strain Cauchy
    stress of the displacement gradient). Used only to derive the rest
    element stiffnesses K_e = -d f/d x at the rest configuration; the runtime
    force path is the corotational ``TetFEM.f_int``.

    pos_e: (E,4,3) vertex positions; Bm: (E,3,3) = Dm^-1; vol: (E,).
    Returns (E,4,3) forces: sigma = 2 mu eps + lam tr(eps) I with
    eps = sym(F) - I; force matrix on vertices 1..3 = -vol * sigma * Bm^T.
    """
    Ds = jnp.stack([pos_e[:, 1] - pos_e[:, 0],
                    pos_e[:, 2] - pos_e[:, 0],
                    pos_e[:, 3] - pos_e[:, 0]], axis=-1)  # (E,3,3)
    F = jnp.einsum("eij,ejk->eik", Ds, Bm, precision=_HI)
    I3 = jnp.eye(3, dtype=pos_e.dtype)
    eps = 0.5 * (F + jnp.swapaxes(F, -1, -2)) - I3
    tre = jnp.trace(eps, axis1=-2, axis2=-1)
    sigma = 2.0 * mu * eps + lam * tre[:, None, None] * I3
    Hm = -vol[:, None, None] * jnp.einsum("eij,ekj->eik", sigma, Bm, precision=_HI)
    f123 = jnp.swapaxes(Hm, 1, 2)  # columns -> rows: (E, 3 verts, 3)
    f0 = -jnp.sum(f123, axis=1, keepdims=True)
    return jnp.concatenate([f0, f123], axis=1)  # (E,4,3)


# ---------------------------------------------------------------------------
# Plant


@jax.tree_util.register_pytree_node_class
class TetFEM:
    """Tet-mesh FEM plant with the FEMSurrogate duck-type interface
    (f/step/jacobians/x_rest/q_rest/n_nodes_dof/state_dim/input_dim), plus a
    matrix-free ``reduced_affine_dynamics`` used by the TPWL pipeline at
    scale. Positions are absolute (scene frame), x = [v; q]."""

    def __init__(self, rest_pos, tets, Bm, vol, Ke, m_node, alpha, beta,
                 free_mask, H, K0, S_q, S_lam, g_full, q_eq, dt,
                 cg_iters: int = 80, cg_tol: float = 1e-6):
        self.rest_pos = jnp.asarray(rest_pos)    # (3n,) mesh rest positions
        self.tets = jnp.asarray(tets)            # (E,4) i32
        self.Bm = jnp.asarray(Bm)                # (E,3,3) rest Dm^-1
        self.vol = jnp.asarray(vol)              # (E,)
        self.Ke = jnp.asarray(Ke)                # (E,12,12) rest elem stiffness
        self.m_node = jnp.asarray(m_node)
        self.alpha = jnp.asarray(alpha)
        self.beta = jnp.asarray(beta)
        self.free_mask = jnp.asarray(free_mask)  # (3n,) 1.0 free / 0.0 fixed
        self.H = jnp.asarray(H)                  # (3n, m)
        self.K0 = jnp.asarray(K0)                # (3n,3n) bc'd rest tangent
        # Eigendecomposition of S0 = M + dt*D + dt^2*K0: applying the
        # preconditioner is two dense matmuls (MXU-friendly) rather than two
        # triangular solves, which sequentialize on TPU (~100x slower there).
        self.S_q = jnp.asarray(S_q)              # (3n,3n) eigenvectors of S0
        self.S_lam = jnp.asarray(S_lam)          # (3n,) eigenvalues of S0
        self.g_full = jnp.asarray(g_full)        # (3n,) gravity accel per dof
        self.q_eq = jnp.asarray(q_eq)            # (3n,) equilibrium positions
        self.dt = float(dt)                      # step size the factor is for
        self.cg_iters = int(cg_iters)            # PCG iteration cap per step
        self.cg_tol = float(cg_tol)              # PCG relative tolerance

    def tree_flatten(self):
        leaves = (self.rest_pos, self.tets, self.Bm, self.vol, self.Ke,
                  self.m_node, self.alpha, self.beta, self.free_mask, self.H,
                  self.K0, self.S_q, self.S_lam, self.g_full, self.q_eq)
        return leaves, (self.dt, self.cg_iters, self.cg_tol)

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        obj = cls.__new__(cls)
        (obj.rest_pos, obj.tets, obj.Bm, obj.vol, obj.Ke, obj.m_node,
         obj.alpha, obj.beta, obj.free_mask, obj.H, obj.K0, obj.S_q,
         obj.S_lam, obj.g_full, obj.q_eq) = leaves
        obj.dt, obj.cg_iters, obj.cg_tol = aux
        return obj

    # ------------------------------------------------------------------
    @property
    def n_nodes(self) -> int:
        return self.rest_pos.shape[0] // 3

    @property
    def n_nodes_dof(self) -> int:
        return self.rest_pos.shape[0]

    @property
    def state_dim(self) -> int:
        return 2 * self.rest_pos.shape[0]

    @property
    def input_dim(self) -> int:
        return self.H.shape[1]

    @property
    def q_rest(self):
        """Equilibrium positions — what the reference saves as rest.pkl
        'after gravity effect' (robots/environments.py:160-168)."""
        return self.q_eq

    def x_rest(self):
        return qv2x(self.q_eq, jnp.zeros_like(self.q_eq))

    # element-frame machinery ---------------------------------------------
    def rotations(self, q):
        """Per-element rotations (E,3,3) from the deformation gradient."""
        pos = q.reshape(-1, 3)[self.tets]
        Ds = jnp.stack([pos[:, 1] - pos[:, 0], pos[:, 2] - pos[:, 0],
                        pos[:, 3] - pos[:, 0]], axis=-1)
        return _polar_rotations(jnp.einsum("eij,ejk->eik", Ds, self.Bm, precision=_HI))

    def node_rotations(self, R):
        """Per-node rotations (n,3,3): polar of the volume-weighted average
        of adjacent element rotations (identity fallback for degenerate
        averages). Used to apply the rest preconditioner in rotated frames."""
        vals = jnp.repeat((self.vol[:, None, None] * R)[:, None], 4,
                          axis=1).reshape(-1, 3, 3)
        acc = jax.ops.segment_sum(vals, self.tets.reshape(-1),
                                  num_segments=self.n_nodes)
        wsum = jax.ops.segment_sum(jnp.repeat(self.vol, 4),
                                   self.tets.reshape(-1),
                                   num_segments=self.n_nodes)
        acc = acc / jnp.maximum(wsum, 1e-12)[:, None, None]
        I3 = jnp.eye(3, dtype=acc.dtype)
        ok = jnp.linalg.det(acc) > 1e-8
        acc = jnp.where(ok[:, None, None], acc, I3[None])
        return _polar_rotations(acc)

    def _gather(self, w):
        return w.reshape(-1, 3)[self.tets]  # (E,4,3)

    def _scatter(self, fe):
        f = jax.ops.segment_sum(fe.reshape(-1, 3), self.tets.reshape(-1),
                                num_segments=self.n_nodes)
        return f.reshape(-1) * self.free_mask

    def f_int(self, q):
        """Corotational internal force (3n,), zeroed on fixed dofs:
        f_e = -R_e K_e (R_e^T x_e - x_e^rest) — the same material law as
        SOFA's TetrahedronFEMForceField method='large'
        (robots/environments.py:55,184)."""
        R = self.rotations(q)
        return self._f_int_frozen(q, R)

    def _f_int_frozen(self, q, R):
        pos = self._gather(q)
        loc = jnp.einsum("eji,evj->evi", R, pos, precision=_HI)
        rest = self._gather(self.rest_pos)
        d = (loc - rest).reshape(-1, 12)
        floc = -jnp.einsum("eij,ej->ei", self.Ke, d, precision=_HI).reshape(-1, 4, 3)
        return self._scatter(jnp.einsum("eij,evj->evi", R, floc, precision=_HI))

    def kt_frozen_matvec(self, w, R):
        """Corotational-tangent matvec K_t w = sum_e R_e K_e R_e^T w with the
        rotations frozen — SPD; used by the per-step PCG solve (the same
        tangent SOFA assembles)."""
        we = self._gather(w)
        loc = jnp.einsum("eji,evj->evi", R, we, precision=_HI).reshape(-1, 12)
        kl = jnp.einsum("eij,ej->ei", self.Ke, loc, precision=_HI).reshape(-1, 4, 3)
        return self._scatter(jnp.einsum("eij,evj->evi", R, kl, precision=_HI))

    # forces ------------------------------------------------------------
    def force(self, q, v, u):
        """Total force: elastic + gravity + cables - Rayleigh damping with
        the current tangent (D = alpha M + beta K_t,
        robots/environments.py:23-26)."""
        R = self.rotations(q)
        f = (self._f_int_frozen(q, R) + self.m_node * self.g_full
             + self.H @ u - self.alpha * self.m_node * v
             - self.beta * self.kt_frozen_matvec(v, R))
        return f * self.free_mask

    def f(self, x, u):
        """Continuous dynamics xdot = [vdot; qdot], x = [v; q]."""
        q, v = x2qv(x)
        acc = self.force(q, v, u) / self.m_node
        return qv2x(v * self.free_mask, acc)

    # stepping ------------------------------------------------------------
    def step(self, x, u, dt):
        """Linearly-implicit Euler (SOFA's EulerImplicitSolver form) with
        the current corotational tangent:

            (M + dt*D + dt^2*K_t) dv = dt*(f(q,v,u) - dt*K_t v)

        solved matrix-free by PCG with the node-rotated rest factor as
        preconditioner (see module docstring). dt is accepted for interface
        parity and must equal ``self.dt`` (the factor's step size).
        """
        q, v = x2qv(x)
        R = self.rotations(q)
        Rn = self.node_rotations(R)
        Kv = self.kt_frozen_matvec(v, R)
        f = (self._f_int_frozen(q, R) + self.m_node * self.g_full
             + self.H @ u - self.alpha * self.m_node * v - self.beta * Kv)
        rhs = dt * (f * self.free_mask - dt * Kv) * self.free_mask
        c_mass = (1.0 + dt * self.alpha) * self.m_node
        c_stiff = dt * self.beta + dt * dt

        def op(w):
            return c_mass * w + c_stiff * self.kt_frozen_matvec(w, R)

        hi = jax.lax.Precision.HIGHEST  # TPU default matmul precision is
        # bf16: enough to NaN the PCG via a corrupted preconditioner

        def prec(r):
            rl = jnp.einsum("nji,nj->ni", Rn, r.reshape(-1, 3), precision=_HI).reshape(-1)
            w1 = jnp.matmul(self.S_q.T, rl * self.free_mask, precision=hi)
            zl = jnp.matmul(self.S_q, w1 / self.S_lam, precision=hi)
            zl = (zl * self.free_mask).reshape(-1, 3)
            return (jnp.einsum("nij,nj->ni", Rn, zl, precision=_HI).reshape(-1)
                    * self.free_mask)

        z0 = prec(rhs)
        nr0 = jnp.linalg.norm(rhs)

        def cond(c):
            k, _, r, _, _, _ = c
            return (k < self.cg_iters) & (jnp.linalg.norm(r)
                                          > self.cg_tol * nr0)

        def body(c):
            k, xx, r, z, pp, rz = c
            Ap = op(pp)
            a = rz / jnp.dot(pp, Ap)
            xx = xx + a * pp
            r = r - a * Ap
            z = prec(r)
            rz2 = jnp.dot(r, z)
            pp = z + (rz2 / rz) * pp
            return (k + 1, xx, r, z, pp, rz2)

        _, dv, _, _, _, _ = jax.lax.while_loop(
            cond, body, (0, jnp.zeros_like(rhs), rhs, z0, z0,
                         jnp.dot(rhs, z0)))
        v2 = (v + dv) * self.free_mask
        q2 = q + dt * v2
        return qv2x(q2, v2)

    def solve_st_multi(self, B_cols, R, Rn):
        """S_t^{-1} B for a block of right-hand sides B_cols (3n, k), with
        S_t = (1+dt*alpha) M + (dt*beta+dt^2) K_t(R) — batched PCG with the
        node-rotated rest preconditioner. One triangular solve serves all k
        columns per iteration (the factor traffic dominates, so k columns
        cost nearly the same as one)."""
        dt = self.dt
        c_mass = (1.0 + dt * self.alpha) * self.m_node
        c_stiff = dt * self.beta + dt * dt
        fm = self.free_mask[:, None]
        B_cols = B_cols * fm

        def op(W):
            KW = jax.vmap(lambda w: self.kt_frozen_matvec(w, R), in_axes=1,
                          out_axes=1)(W)
            return c_mass * W + c_stiff * KW

        hi = jax.lax.Precision.HIGHEST  # see step(): bf16 default matmuls
        # corrupt the preconditioner enough to blow up f32 PCG on TPU

        def prec(Rr):
            rl = jnp.einsum("nji,nvj->nvi", Rn,
                            Rr.reshape(self.n_nodes, 3, -1).swapaxes(1, 2), precision=_HI)
            rl = rl.swapaxes(1, 2).reshape(Rr.shape) * fm
            W1 = jnp.matmul(self.S_q.T, rl, precision=hi)
            Z = jnp.matmul(self.S_q, W1 / self.S_lam[:, None],
                           precision=hi) * fm
            zl = jnp.einsum("nij,nvj->nvi", Rn,
                            Z.reshape(self.n_nodes, 3, -1).swapaxes(1, 2), precision=_HI)
            return zl.swapaxes(1, 2).reshape(Rr.shape) * fm

        Z0 = prec(B_cols)
        nr0 = jnp.linalg.norm(B_cols, axis=0)

        def cond(c):
            k, _, Rr, _, _, _ = c
            return (k < self.cg_iters) & jnp.any(
                jnp.linalg.norm(Rr, axis=0) > self.cg_tol * nr0)

        tiny = jnp.asarray(jnp.finfo(B_cols.dtype).tiny, B_cols.dtype)

        def body(c):
            k, X, Rr, Z, P, rz = c
            Ap = op(P)
            # guards must be representable in the working dtype: converged
            # columns keep iterating until the slowest one finishes, and an
            # underflowing denominator would turn them into 0/0 NaNs
            denom = jnp.maximum(jnp.sum(P * Ap, axis=0), tiny)
            a = rz / denom
            X = X + a * P
            Rr = Rr - a * Ap
            Z = prec(Rr)
            rz2 = jnp.sum(Rr * Z, axis=0)
            P = Z + (rz2 / jnp.maximum(rz, tiny)) * P
            return (k + 1, X, Rr, Z, P, rz2)

        _, X, _, _, _, _ = jax.lax.while_loop(
            cond, body, (0, jnp.zeros_like(B_cols), B_cols, Z0, Z0,
                         jnp.sum(B_cols * Z0, axis=0)))
        return X

    def reduced_discrete_dynamics(self, rom, x, u, dt, x_next_r=None):
        """ROM-projected *discrete* affine dynamics (A_d, B_d, d_d) of the
        plant's own linearly-implicit step — the TPU-native analog of the
        reference's discrete TPWL built from SOFA's implicit system matrix
        (extract_AB_d, sofacontrol/utils.py:289-299, ThieffryKruszewski2019).

        For stiff FEM this is the *right* reduced model: backward Euler
        performs implicit static condensation of the stiff modes, which a
        Galerkin projection of the continuous dynamics misses by O(1). With
        v+ = v + S^-1 dt (f - dt K_t v), q+ = q + dt v+ and rotations frozen,

            dv+/dv = S^-1 M,  dv+/dq = -dt S^-1 K_t,  dv+/du = dt S^-1 H,

        so one batched PCG solve with (2r + m) right-hand sides yields the
        projected step Jacobians. d_d makes the map exact at the point:
        pass x_next_r (recorded next reduced state) when sweeping a recorded
        trajectory, else one plant step is taken.
        """
        x = jnp.asarray(x)
        u = jnp.asarray(u)
        q, v = x2qv(x)
        U = rom.U
        r = U.shape[1]
        R = self.rotations(q)
        Rn = self.node_rotations(R)
        fm = self.free_mask[:, None]
        Um = U * fm
        KU = jax.vmap(lambda w: self.kt_frozen_matvec(w, R), in_axes=1,
                      out_axes=1)(Um)
        B_cols = jnp.concatenate(
            [self.m_node * Um, KU * fm, self.H * fm], axis=1)
        sol = self.solve_st_multi(B_cols, R, Rn)
        Avv = U.T @ sol[:, :r]
        Avq = -dt * (U.T @ sol[:, r:2 * r])
        Bv = dt * (U.T @ sol[:, 2 * r:])
        Ir = jnp.eye(r, dtype=x.dtype)
        A_d = jnp.block([[Avv, Avq], [dt * Avv, Ir + dt * Avq]])
        B_d = jnp.concatenate([Bv, dt * Bv], axis=0)
        if x_next_r is None:
            x_next_r = rom.project_x(self.step(x, u, dt))
        x_r = rom.project_x(x)
        d_d = jnp.asarray(x_next_r) - A_d @ x_r - B_d @ u
        return A_d, B_d, d_d

    # Jacobians -----------------------------------------------------------
    def kt_matvec(self, q, w):
        """Exact tangent-stiffness matvec K_t(q) w (including rotation
        derivatives), matrix-free via jvp of the corotational force."""
        _, df = jax.jvp(self.f_int, (q,), (w,))
        return -df

    def jacobians(self, x, u):
        """Dense (A, B, d) — only sensible for small meshes; the pipeline
        uses reduced_affine_dynamics at scale."""
        if self.n_nodes > 400:
            raise NotImplementedError(
                "dense state Jacobian at this mesh scale would be "
                f"({self.state_dim}x{self.state_dim}); use "
                "reduced_affine_dynamics")
        q, v = x2qv(x)
        n = self.n_nodes_dof
        eye = jnp.eye(n, dtype=q.dtype)
        Kt = jax.vmap(lambda w: self.kt_matvec(q, w), in_axes=1,
                      out_axes=1)(eye)
        R = self.rotations(q)
        Kc = jax.vmap(lambda w: self.kt_frozen_matvec(w, R), in_axes=1,
                      out_axes=1)(eye)
        Minv = 1.0 / self.m_node
        A = jnp.zeros((2 * n, 2 * n), dtype=q.dtype)
        A = A.at[:n, :n].set(-Minv * (self.alpha * self.m_node * eye
                                      + self.beta * Kc)
                             * self.free_mask[:, None])
        A = A.at[:n, n:].set(-Minv * Kt * self.free_mask[:, None])
        A = A.at[n:, :n].set(jnp.diag(self.free_mask))
        B = jnp.concatenate((Minv * self.H * self.free_mask[:, None],
                             jnp.zeros_like(self.H)), axis=0)
        d = self.f(x, u) - A @ x - B @ u
        return A, B, d

    def reduced_affine_dynamics(self, rom, x, u):
        """ROM-projected affine dynamics (A_r, B_r, d_r) at (x, u) without
        materializing the full Jacobian: U^T K_t U via r jvp's of the
        element-force sweep. Plays the role of the reference's LDL export +
        extract_AB + compute_RO_matrix chain (sofacontrol/utils.py:180-299,
        mor/pod.py:56-79)."""
        x = jnp.asarray(x)
        u = jnp.asarray(u)
        q, v = x2qv(x)
        U = rom.U  # (3n, r)
        r = U.shape[1]
        Um = U * self.free_mask[:, None]
        KtU = jax.vmap(lambda w: self.kt_matvec(q, w), in_axes=1,
                       out_axes=1)(Um)
        R = self.rotations(q)
        KcU = jax.vmap(lambda w: self.kt_frozen_matvec(w, R), in_axes=1,
                       out_axes=1)(Um)
        UtKtU = U.T @ KtU                                # (r, r)
        UtKcU = U.T @ KcU
        Minv = 1.0 / self.m_node
        Ir = jnp.eye(r, dtype=x.dtype)
        A_r = jnp.zeros((2 * r, 2 * r), dtype=x.dtype)
        A_r = A_r.at[:r, :r].set(-(self.alpha * Ir
                                   + self.beta * Minv * UtKcU))
        A_r = A_r.at[:r, r:].set(-Minv * UtKtU)
        A_r = A_r.at[r:, :r].set(Ir)
        B_r = jnp.concatenate((Minv * (U.T @ (self.H
                                              * self.free_mask[:, None])),
                               jnp.zeros((r, self.H.shape[1]),
                                         dtype=x.dtype)), axis=0)
        xdot = self.f(x, u)
        qdot, vdot = x2qv(xdot)  # x2qv returns (second half, first half)
        f_r = jnp.concatenate((U.T @ vdot, U.T @ qdot))
        x_r = rom.project_x(x)
        d_r = f_r - A_r @ x_r - B_r @ u
        return A_r, B_r, d_r



# ---------------------------------------------------------------------------
# Builders


def _element_stiffness(rest_pos, tets, Bm, vol, mu, lam):
    """Rest element stiffnesses K_e (E,12,12) = -d f_e/d x_e of the linear
    element force at the rest configuration (symmetric PSD), via batched
    jacfwd."""

    def elem_force_flat(xe, Bm_e, vol_e):
        f = _linear_element_forces(xe.reshape(1, 4, 3), Bm_e[None],
                                   vol_e[None], mu, lam)
        return f.reshape(12)

    jac = jax.jit(jax.vmap(jax.jacfwd(elem_force_flat)))
    Ke = -np.asarray(jac(jnp.asarray(rest_pos.reshape(-1, 3)[tets]
                                     .reshape(-1, 12)),
                         jnp.asarray(Bm), jnp.asarray(vol)))
    return 0.5 * (Ke + np.swapaxes(Ke, 1, 2))  # symmetrize exactly


def _assemble_k0(Ke, tets, n_nodes, dtype):
    """Dense rest tangent stiffness (3n,3n) scattered from the element
    stiffnesses on host (build time only)."""
    dof = (3 * tets[:, :, None] + np.arange(3)[None, None, :]).reshape(-1, 12)
    n3 = 3 * n_nodes
    K = np.zeros((n3, n3), dtype=np.float64)
    rows = np.repeat(dof, 12, axis=1).reshape(-1)
    cols = np.tile(dof, (1, 12)).reshape(-1)
    np.add.at(K, (rows, cols), Ke.reshape(-1))
    return K.astype(dtype)


def _bary_embed(points: np.ndarray, tets: np.ndarray, query: np.ndarray):
    """Barycentric embedding of query points (k,3) into the tet mesh:
    returns (tet_idx (k,), bary (k,4)). Picks the least-violating tet; a
    point far outside any tet snaps to its nearest mesh node (the role of
    SOFA's BarycentricMapping for the cable attachment points)."""
    p0 = points[tets[:, 0]]  # (E,3)
    Dm = np.stack([points[tets[:, 1]] - p0, points[tets[:, 2]] - p0,
                   points[tets[:, 3]] - p0], axis=-1)
    Dm_inv = np.linalg.inv(Dm)  # (E,3,3)
    idx, bary = [], []
    for pq in query:
        b123 = np.einsum("eij,ej->ei", Dm_inv, pq[None] - p0)  # (E,3)
        b = np.concatenate([(1.0 - b123.sum(axis=1))[:, None], b123], axis=1)
        viol = -np.minimum(b.min(axis=1), 0.0)
        e = int(np.argmin(viol))
        if viol[e] > 0.25:  # outside the mesh: nearest node
            node = int(np.argmin(np.linalg.norm(points - pq, axis=1)))
            local = tets[np.any(tets == node, axis=1)][0]
            e = int(np.where(np.all(tets == local, axis=1))[0][0])
            bb = np.zeros(4)
            bb[list(local).index(node)] = 1.0
            idx.append(e)
            bary.append(bb)
        else:
            idx.append(e)
            bary.append(b[e])
    return np.asarray(idx), np.asarray(bary)


def _cable_column(points, tets, waypoints, pull_point=None):
    """One H column (3n,) for unit cable tension.

    With a pull point (Diamond, environments.py:196-238): force at each
    geometry point toward the pull point. Without (Trunk polyline cables,
    environments.py:70-137): tension along the polyline — each waypoint is
    pulled toward its neighbors."""
    wp = np.asarray(waypoints, dtype=np.float64)
    n = points.shape[0]
    col = np.zeros(3 * n)
    forces = np.zeros_like(wp)
    if pull_point is not None:
        for j in range(wp.shape[0]):
            d = np.asarray(pull_point) - wp[j]
            forces[j] = d / np.linalg.norm(d)
    else:
        for j in range(wp.shape[0]):
            for k in (j - 1, j + 1):
                if 0 <= k < wp.shape[0]:
                    d = wp[k] - wp[j]
                    forces[j] += d / np.linalg.norm(d)
    eidx, bary = _bary_embed(points, tets, wp)
    for j in range(wp.shape[0]):
        for vloc in range(4):
            node = tets[eidx[j], vloc]
            col[3 * node:3 * node + 3] += bary[j, vloc] * forces[j]
    return col


def with_young_scale(plant: TetFEM, s: float, alpha: float = None,
                     settle_time: float = 0.0) -> TetFEM:
    """Return a plant with Young's modulus scaled by ``s`` (and optionally a
    new Rayleigh alpha) WITHOUT re-assembling or re-eigendecomposing.

    Because the lumped mass is a scalar multiple of the identity, the step
    matrix S(s) = (1+dt*a)*m*I + (dt*b+dt^2)*s*K0 commutes with K0 and
    shares its eigenvectors: only the eigenvalues shift. This makes
    stiffness calibration against SOFA's recorded rest field (rest_qv.pkl)
    a few settle runs instead of hours of dense eigh at n=9768.
    """
    dt = plant.dt
    m = float(plant.m_node)
    a_old = float(plant.alpha)
    a_new = a_old if alpha is None else float(alpha)
    c1o, c2o = 1.0 + dt * a_old, dt * float(plant.beta) + dt * dt
    c1n, c2n = 1.0 + dt * a_new, c2o
    # recover K0 eigenvalues on the shared eigenvectors, then rebuild S's
    lam_k = (plant.S_lam - c1o * m) / c2o
    S_lam_new = jnp.maximum(c1n * m + c2n * s * lam_k,
                            jnp.asarray(1e-8 * m, plant.S_lam.dtype))
    leaves, aux = plant.tree_flatten()
    dtype = plant.S_lam.dtype
    new = TetFEM.tree_unflatten(aux, leaves)
    new.Ke = plant.Ke * dtype.type(s)
    new.K0 = plant.K0 * dtype.type(s)
    new.alpha = jnp.asarray(a_new, dtype)
    new.S_lam = S_lam_new.astype(dtype)
    if settle_time > 0.0:
        from soft_robot_control_tpu.sim.fem_surrogate import simulate
        T = int(round(settle_time / dt))
        u0 = jnp.zeros((T, new.input_dim), dtype)
        X = simulate(new, qv2x(new.rest_pos, jnp.zeros_like(new.rest_pos)),
                     u0, dt)
        new.q_eq = X[-1, new.n_nodes_dof:]
    return new


PLANT_CACHE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".plant_cache")


def _save_plant(plant: TetFEM, path: str) -> None:
    """Atomic write (tmp + rename): a process killed mid-write must never
    leave a truncated npz at the cache path."""
    leaves, aux = plant.tree_flatten()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp.{os.getpid()}.npz"  # np.savez appends .npz itself
    try:
        np.savez_compressed(tmp, aux=np.asarray(aux, dtype=np.float64),
                            **{f"leaf{i}": np.asarray(a)
                               for i, a in enumerate(leaves)})
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def _load_plant(path: str) -> TetFEM:
    """Raises on any corruption; callers catch and rebuild."""
    z = np.load(path)
    leaves = [jnp.asarray(z[f"leaf{i}"]) for i in range(len(z.files) - 1)]
    dt, cg_iters, cg_tol = z["aux"]
    return TetFEM.tree_unflatten((float(dt), int(cg_iters), float(cg_tol)),
                                 leaves)


def _load_plant_or_evict(path: str):
    """Load a cached plant; on any failure (truncated zip, missing keys,
    bad shapes) evict the corrupt file and return None so the caller
    rebuilds instead of failing forever."""
    try:
        return _load_plant(path)
    except Exception as e:  # noqa: BLE001 — any corruption means rebuild
        warnings.warn(f"corrupt plant cache {path} ({e!r}); rebuilding")
        try:
            os.remove(path)
        except OSError:
            pass
        return None


def build_tet_fem(points: np.ndarray, tets: np.ndarray, *, young: float,
                  poisson: float, total_mass: float, alpha: float,
                  beta: float, fixed_box, cables, dt: float,
                  gravity=(0.0, 0.0, 0.0), settle_time: float = 0.0,
                  dtype=np.float64) -> TetFEM:
    """Assemble a TetFEM plant.

    fixed_box: (xmin, ymin, zmin, xmax, ymax, zmax) — nodes inside are
    Dirichlet-fixed (the BoxROI + RestShapeSpringsForceField pattern,
    robots/environments.py:61-63,188-190). cables: list of dicts with
    'waypoints' (k,3) and optional 'pull_point' (3,). settle_time > 0 runs
    the plant under zero input to find the post-gravity equilibrium (the
    reference's rest.pkl, environments.py:160-168).
    """
    points = np.asarray(points, dtype=np.float64)
    tets, Bm, vol = _tet_precompute(points, np.asarray(tets))
    n = points.shape[0]
    mu = young / (2.0 * (1.0 + poisson))
    lam = young * poisson / ((1.0 + poisson) * (1.0 - 2.0 * poisson))
    m_node = total_mass / n

    lo, hi = np.asarray(fixed_box[:3]), np.asarray(fixed_box[3:])
    fixed = np.all((points >= lo) & (points <= hi), axis=1)
    free_mask = np.repeat(~fixed, 3).astype(np.float64)

    H = np.stack([_cable_column(points, tets, c["waypoints"],
                                c.get("pull_point")) for c in cables], axis=1)
    H *= free_mask[:, None]

    Ke = _element_stiffness(points.reshape(-1), tets, Bm, vol, mu, lam)
    K0 = _assemble_k0(Ke, tets, n, np.float64)
    K0 = K0 * free_mask[:, None] * free_mask[None, :]

    n3 = 3 * n
    S = ((1.0 + dt * alpha) * m_node * np.eye(n3)
         + (dt * beta + dt * dt) * K0)
    # fixed dofs: decouple with a positive diagonal so dv_fixed = 0
    diag_ix = np.where(free_mask == 0.0)[0]
    S[diag_ix, :] = 0.0
    S[:, diag_ix] = 0.0
    S[diag_ix, diag_ix] = m_node
    S_lam, S_q = np.linalg.eigh(S)

    g_full = np.tile(np.asarray(gravity, dtype=np.float64), n) * free_mask

    plant = TetFEM(points.reshape(-1).astype(dtype), tets, Bm.astype(dtype),
                   vol.astype(dtype), Ke.astype(dtype), dtype(m_node),
                   dtype(alpha), dtype(beta), free_mask.astype(dtype),
                   H.astype(dtype), K0.astype(dtype), S_q.astype(dtype),
                   S_lam.astype(dtype), g_full.astype(dtype),
                   points.reshape(-1).astype(dtype), dt)

    if settle_time > 0.0 and np.any(np.asarray(gravity) != 0.0):
        from soft_robot_control_tpu.sim.fem_surrogate import simulate
        T = int(round(settle_time / dt))
        u0 = jnp.zeros((T, len(cables)), dtype=plant.H.dtype)
        X = simulate(plant, plant.x_rest(), u0, dt)
        q_eq = np.asarray(X[-1, n3:])
        plant.q_eq = jnp.asarray(q_eq.astype(dtype))
    return plant


# ---------------------------------------------------------------------------
# Reference robots


def diamond_cables():
    """The four Diamond cables: single attachment point + pull point, scene
    frame (robots/environments.py:196-215)."""
    params = [([0, 97, 45], [0, 10, 30]), ([-97, 0, 45], [-10, 0, 30]),
              ([0, -97, 45], [0, -10, 30]), ([97, 0, 45], [10, 0, 30])]
    return [{"waypoints": np.asarray([a], dtype=np.float64),
             "pull_point": np.asarray(p, dtype=np.float64)}
            for a, p in params]


def trunk_cables():
    """The eight Trunk polyline cables (4 long, 4 short), replicating the
    Quat/Vec3 waypoint construction of robots/environments.py:70-137."""
    length1, length2, length_trunk = 10.0, 2.0, 195.0
    direction = np.array([0.0, length2 - length1, length_trunk])
    direction /= np.linalg.norm(direction)
    pull = [[0.0, length1, 0.0], [-length1, 0.0, 0.0],
            [0.0, -length1, 0.0], [length1, 0.0, 0.0]]

    def rot_z(theta, v):
        c, s = np.cos(theta), np.sin(theta)
        return np.array([c * v[0] - s * v[1], s * v[0] + c * v[1], v[2]])

    cables = []
    for n_pts, n_idx in ((20, 21), (10, 10)):
        for i in range(4):
            theta = 1.57 * i
            pts = []
            for k in range(0, n_pts, 2):
                for z_off in (21.0, 27.0):
                    v = np.array([direction[0],
                                  direction[1] * 17.5 * (k / 2) + length1,
                                  direction[2] * 17.5 * (k / 2) + z_off])
                    pts.append(rot_z(theta, v))
            wp = np.asarray([pull[i]] + pts)[:n_idx]
            cables.append({"waypoints": wp})
    return cables


def diamond_tet_fem(*, young: float = 175.0, poisson: float = 0.45,
                    total_mass: float = 0.45, alpha: float = 2.5,
                    beta: float = 0.01, dt: float = 0.01,
                    gravity_on: bool = True, settle_time: float = 1.5,
                    mesh_path: str = None, dtype=np.float64,
                    cache: bool = True) -> TetFEM:
    """The hardware-calibrated Diamond (examples/hardware/model.py:28-45)
    over the shipped diamond.vtu: 1628 nodes -> 9768-dim state, 4 cables,
    rotation [90,0,0] + translation [0,0,35], BoxROI base fix
    (robots/environments.py:139-238)."""
    key = (f"diamond_{young}_{poisson}_{total_mass}_{alpha}_{beta}_{dt}_"
           f"{gravity_on}_{settle_time}_{np.dtype(dtype).name}.npz")
    cpath = os.path.join(PLANT_CACHE_DIR, key)
    use_cache = cache and mesh_path is None
    if use_cache and os.path.exists(cpath):
        cached = _load_plant_or_evict(cpath)
        if cached is not None:
            return cached
    mesh_path = mesh_path or os.path.join(REFERENCE_MESH_DIR, "diamond.vtu")
    pts, tets = load_vtu_ascii(mesh_path)
    pts = transform_mesh(pts, rotation_deg=(90.0, 0.0, 0.0),
                         translation=(0.0, 0.0, 35.0))
    g = (0.0, 0.0, -9810.0) if gravity_on else (0.0, 0.0, 0.0)
    plant = build_tet_fem(pts, tets, young=young, poisson=poisson,
                          total_mass=total_mass, alpha=alpha, beta=beta,
                          fixed_box=(-15.0, -15.0, -40.0, 15.0, 15.0, 10.0),
                          cables=diamond_cables(), dt=dt, gravity=g,
                          settle_time=settle_time if gravity_on else 0.0,
                          dtype=dtype)
    if use_cache:
        _save_plant(plant, cpath)
    return plant


def trunk_tet_fem(*, young: float = 450.0, poisson: float = 0.45,
                  total_mass: float = 0.042, alpha: float = 0.1,
                  beta: float = 0.1, dt: float = 0.01,
                  gravity_on: bool = True, settle_time: float = 1.5,
                  mesh_path: str = None, dtype=np.float64,
                  cache: bool = True) -> TetFEM:
    """The Trunk (robots/environments.py:39-137) over the shipped trunk.vtk:
    709 nodes -> 4254-dim state, 8 polyline cables, base fixed in
    [[-20,-20,0],[20,20,20]]."""
    key = (f"trunk_{young}_{poisson}_{total_mass}_{alpha}_{beta}_{dt}_"
           f"{gravity_on}_{settle_time}_{np.dtype(dtype).name}.npz")
    cpath = os.path.join(PLANT_CACHE_DIR, key)
    use_cache = cache and mesh_path is None
    if use_cache and os.path.exists(cpath):
        cached = _load_plant_or_evict(cpath)
        if cached is not None:
            return cached
    mesh_path = mesh_path or os.path.join(REFERENCE_MESH_DIR, "trunk.vtk")
    pts, tets = load_vtk_legacy(mesh_path)
    g = (0.0, 0.0, 9810.0) if gravity_on else (0.0, 0.0, 0.0)
    plant = build_tet_fem(pts, tets, young=young, poisson=poisson,
                          total_mass=total_mass, alpha=alpha, beta=beta,
                          fixed_box=(-20.0, -20.0, 0.0, 20.0, 20.0, 20.0),
                          cables=trunk_cables(), dt=dt, gravity=g,
                          settle_time=settle_time if gravity_on else 0.0,
                          dtype=dtype)
    if use_cache:
        _save_plant(plant, cpath)
    return plant


def make_box_mesh(nx: int = 3, ny: int = 3, nz: int = 5, spacing: float = 10.0):
    """Small synthetic box tet mesh (each grid cell split into 5 tets) for
    fast tests — same element machinery as the reference meshes without the
    multi-second build."""
    xs = np.arange(nx) * spacing
    ys = np.arange(ny) * spacing
    zs = np.arange(nz) * spacing
    pts = np.stack(np.meshgrid(xs, ys, zs, indexing="ij"),
                   axis=-1).reshape(-1, 3)

    def nid(i, j, k):
        return (i * ny + j) * nz + k

    tets = []
    for i in range(nx - 1):
        for j in range(ny - 1):
            for k in range(nz - 1):
                v = [nid(i, j, k), nid(i + 1, j, k), nid(i, j + 1, k),
                     nid(i + 1, j + 1, k), nid(i, j, k + 1),
                     nid(i + 1, j, k + 1), nid(i, j + 1, k + 1),
                     nid(i + 1, j + 1, k + 1)]
                if (i + j + k) % 2 == 0:
                    cells = [(0, 1, 3, 5), (0, 3, 2, 6), (0, 5, 6, 4),
                             (3, 5, 6, 7), (0, 3, 6, 5)]
                else:
                    cells = [(1, 0, 2, 4), (1, 2, 3, 7), (1, 4, 7, 5),
                             (2, 4, 6, 7), (1, 2, 7, 4)]
                tets.extend([tuple(v[c] for c in cell) for cell in cells])
    return pts.astype(np.float64), np.asarray(tets, dtype=np.int32)
