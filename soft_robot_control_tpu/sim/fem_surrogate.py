"""Jitted FEM surrogate plant — the SOFA replacement.

The reference uses the external SOFA C++ FEM engine as ground-truth physics
(robots/environments.py:23-26) and extracts (K, D, M, H, b, f) matrices from
its LDL exporter to build TPWL models (sofacontrol/utils.py:180-299). SOFA is
explicitly out of the loop for this framework (BASELINE.md), so this module
provides an in-repo differentiable surrogate with the same structure:

    M qdd = -K (q - q_rest) - D qd - gamma * (q - q_rest)^3  + H u
    D = alpha M + beta K            (Rayleigh damping, environments.py:23-26)

packed as x = [v; q]. The cubic hardening term makes the plant genuinely
nonlinear so that TPWL/SSM reduction is meaningful. Analytic Jacobians play
the role of SOFA's exported stiffness matrices (utils.py:180-206): the
offline TPWL pipeline linearizes this plant directly instead of parsing LDL
text files.

Everything is a pytree + pure jitted functions: steps run under `lax.scan`,
batches under `vmap`, and the plant can serve as the closed-loop "true
physics" on device.
"""

from __future__ import annotations

from functools import partial
import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.core.packing import qv2x, x2qv


@jax.tree_util.register_pytree_node_class
class FEMSurrogate:
    """Second-order structural plant with cubic hardening.

    K: (n, n) stiffness; m_node: scalar nodal mass (M = m I, matching the
    UniformMass + vertexMass convention of utils.py:183,200); alpha, beta:
    Rayleigh coefficients; gamma: cubic hardening coefficient; q_rest: (n,);
    H: (n, m) input matrix (cable directions).
    """

    def __init__(self, K, m_node, alpha, beta, gamma, q_rest, H):
        self.K = jnp.asarray(K)
        self.m_node = jnp.asarray(m_node)
        self.alpha = jnp.asarray(alpha)
        self.beta = jnp.asarray(beta)
        self.gamma = jnp.asarray(gamma)
        self.q_rest = jnp.asarray(q_rest)
        self.H = jnp.asarray(H)

    def tree_flatten(self):
        return (self.K, self.m_node, self.alpha, self.beta, self.gamma,
                self.q_rest, self.H), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        (obj.K, obj.m_node, obj.alpha, obj.beta, obj.gamma, obj.q_rest,
         obj.H) = children
        return obj

    # ------------------------------------------------------------------
    @property
    def n_nodes_dof(self) -> int:
        return self.K.shape[0]

    @property
    def state_dim(self) -> int:
        return 2 * self.K.shape[0]

    @property
    def input_dim(self) -> int:
        return self.H.shape[1]

    @property
    def D(self):
        """Rayleigh damping D = alpha M + beta K."""
        n = self.n_nodes_dof
        return self.alpha * self.m_node * jnp.eye(n, dtype=self.K.dtype) + self.beta * self.K

    def x_rest(self):
        return qv2x(self.q_rest, jnp.zeros_like(self.q_rest))

    # dynamics -----------------------------------------------------------
    def f(self, x, u):
        """Continuous dynamics xdot = f(x, u), x = [v; q]."""
        q, v = x2qv(x)
        dq = q - self.q_rest
        force = -self.K @ dq - self.D @ v - self.gamma * dq**3 + self.H @ u
        vdot = force / self.m_node
        # xdot = [vdot; qdot] with qdot = v, in the same [v; q] packing
        return qv2x(v, vdot)

    def jacobians(self, x, u):
        """Analytic (A, B, d) of the affine expansion at (x, u).

        A = [[-M^-1 D, -M^-1 K_t], [I, 0]] with tangent stiffness
        K_t = K + 3 gamma diag((q-q_rest)^2); this mirrors extract_AB
        (utils.py:251-286) with the FEM matrices generated analytically.
        """
        q, v = x2qv(x)
        n = self.n_nodes_dof
        dq = q - self.q_rest
        Kt = self.K + jnp.diag(3.0 * self.gamma * dq**2)
        Minv = 1.0 / self.m_node
        A = jnp.zeros((2 * n, 2 * n), dtype=self.K.dtype)
        A = A.at[:n, :n].set(-Minv * self.D)
        A = A.at[:n, n:].set(-Minv * Kt)
        A = A.at[n:, :n].set(jnp.eye(n, dtype=self.K.dtype))
        B = jnp.concatenate((Minv * self.H, jnp.zeros_like(self.H)), axis=0)
        d = self.f(x, u) - A @ x - B @ u
        return A, B, d

    # time stepping --------------------------------------------------------
    def step(self, x, u, dt):
        """Semi-implicit (linearly implicit) Euler step:

            (I - dt A(x)) dx = dt f(x, u);   x+ = x + dx

        the same family of integrator SOFA's EulerImplicitSolver uses, so the
        surrogate is stable at the stiff settings typical of these robots.
        """
        A, _, _ = self.jacobians(x, u)
        n2 = self.state_dim
        lhs = jnp.eye(n2, dtype=x.dtype) - dt * A
        dx = jnp.linalg.solve(lhs, dt * self.f(x, u))
        return x + dx


@partial(jax.jit, static_argnames=())
def simulate(plant: FEMSurrogate, x0, u_seq, dt):
    """Roll the plant under an input sequence u_seq (N, m) via lax.scan.

    Returns x trajectory (N+1, 2n).
    """
    def body(x, u_t):
        x_next = plant.step(x, u_t, dt)
        return x_next, x_next

    _, xs = jax.lax.scan(body, x0, u_seq)
    return jnp.concatenate((x0[None], xs), axis=0)


def simulate_batch(plant: FEMSurrogate, x0, u_seq, dt):
    """vmap over batched initial conditions (B, 2n) and inputs (B, N, m)."""
    return jax.vmap(lambda a, b: simulate(plant, a, b, dt))(x0, u_seq)


def simulate_batch_chunked(plant, x0, u_seq, dt, chunk: int = 50):
    """`simulate_batch` in fixed-size time chunks. Large batched scans at
    reference tet-mesh scale crash the TPU runtime the same way long
    single-program scans do (kernel fault at batch x T x state ~ 12 x 250
    x 9768, observed in the Diamond SSM decay campaign; 12 x 50 survives —
    the limit tracks per-program device time, consistent with an RPC
    deadline in the axon tunnel). Chunking bounds the per-program extent
    and reuses one compiled executable for any horizon.
    Returns (B, T+1, 2n) like `simulate_batch`."""
    u = jnp.asarray(u_seq)
    B, T = u.shape[0], u.shape[1]
    outs = [jnp.asarray(x0)[:, None]]
    x = jnp.asarray(x0)
    for s in range(0, T, chunk):
        seg = u[:, s:s + chunk]
        if seg.shape[1] < chunk:  # pad to the compiled shape, trim after
            pad = chunk - seg.shape[1]
            seg_p = jnp.concatenate(
                [seg, jnp.zeros((B, pad, seg.shape[2]), seg.dtype)], axis=1)
            X = simulate_batch(plant, x, seg_p, dt)[:, 1:seg.shape[1] + 1]
        else:
            X = simulate_batch(plant, x, seg, dt)[:, 1:]
        X = jax.block_until_ready(X)
        outs.append(X)
        x = X[:, -1]
    return jnp.concatenate(outs, axis=1)


# ---------------------------------------------------------------------------
# Factory: a small diamond/trunk-like robot


def make_chain_robot(n_nodes: int = 12, n_cables: int = 4, k: float = 40.0,
                     m_node: float = 0.05, alpha: float = 1.5,
                     beta: float = 0.01, gamma: float = 25.0,
                     seed: int = 0, dtype=np.float64) -> FEMSurrogate:
    """A fixed-base chain of nodes with nearest-neighbor springs and
    `n_cables` cables pulling on distributed node sets — structurally
    analogous to the Diamond (4 cables) / Trunk (8 cables) robots.
    """
    rng = np.random.default_rng(seed)
    n = n_nodes
    # Chain stiffness (tridiagonal SPD), fixed base via strong anchor on node 0
    K = np.zeros((n, n))
    for i in range(n - 1):
        K[i, i] += k
        K[i + 1, i + 1] += k
        K[i, i + 1] -= k
        K[i + 1, i] -= k
    K[0, 0] += 10 * k  # anchor
    # Cables: each pulls a random contiguous span of nodes with decaying profile
    H = np.zeros((n, n_cables))
    for c in range(n_cables):
        start = rng.integers(0, n // 2)
        profile = np.exp(-0.3 * np.arange(n - start))
        sign = 1.0 if c % 2 == 0 else -1.0
        H[start:, c] = sign * profile
    q_rest = rng.normal(0.0, 0.2, size=n)
    return FEMSurrogate(K.astype(dtype), dtype(m_node), dtype(alpha),
                        dtype(beta), dtype(gamma), q_rest.astype(dtype),
                        H.astype(dtype))


def simulate_chunked(plant, x0, u_seq, dt, chunk: int = 500):
    """`simulate` in fixed-size chunks: one compiled scan of `chunk` steps
    re-invoked across the horizon. Long single-program scans (T ~ 4000) at
    reference mesh scale reproducibly crash the TPU runtime ("kernel
    fault"), and chunking also caches one executable for any horizon.
    Returns (T+1, 2n) like `simulate`."""
    import numpy as np

    u = jnp.asarray(u_seq)
    T = u.shape[0]
    outs = [jnp.asarray(x0)[None]]
    x = jnp.asarray(x0)
    for s in range(0, T, chunk):
        seg = u[s:s + chunk]
        if seg.shape[0] < chunk:  # pad to the compiled shape, trim after
            pad = chunk - seg.shape[0]
            seg_p = jnp.concatenate(
                [seg, jnp.zeros((pad, seg.shape[1]), seg.dtype)], axis=0)
            X = simulate(plant, x, seg_p, dt)[1:seg.shape[0] + 1]
        else:
            X = simulate(plant, x, seg, dt)[1:]
        outs.append(X)
        x = X[-1]
    return jnp.concatenate(outs, axis=0)
