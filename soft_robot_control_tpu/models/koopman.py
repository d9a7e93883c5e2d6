"""Koopman lifted-linear models with delay embedding.

Capability parity with sofacontrol/baselines/koopman/koopman_utils.py:
- KoopmanScaling: affine up/down scaling of measurements and inputs;
- KoopmanData: online delay buffer building zeta = [y; y_delays; u_delays];
- KoopmanModel: lifted LTI dynamics x+ = A_d x + B_d u, y = C x on
  polynomial observables of zeta, loaded from the MATLAB-trained .mat
  artifacts (soft-robot-koopman layout) unchanged;
- lifting via static grlex exponent tables (constant moved to the end,
  koopman_utils.py:166-170) evaluated as jnp power products — no sympy.

Plus a native EDMD trainer (`train_edmd`) replacing the MATLAB pipeline
(generate_koopman_model.m): plain least-squares on lifted snapshots.
"""

from __future__ import annotations

from functools import lru_cache
from itertools import product
import jax
import jax.numpy as jnp
import numpy as np

from soft_robot_control_tpu.ops.monomials import eval_monomials


@lru_cache(maxsize=None)
def koopman_exponents(dim: int, order: int, dmd: bool = False):
    """grlex exponent table with the reference's constant-handling:
    sorted by (total degree, ascending lex on reversed exponents); the
    constant monomial is dropped for DMD and moved to the END otherwise
    (koopman_utils.py:156-176). Returns (n_mono, dim) int array."""
    exps = [e for e in product(range(order + 1), repeat=dim)
            if 0 < sum(e) <= order]
    exps.sort(key=lambda e: (sum(e), tuple(reversed(e))))
    if not dmd:
        exps.append((0,) * dim)
    return np.asarray(exps, dtype=np.int32)


class KoopmanScaling:
    """Affine scaling (koopman_utils.py:86-107)."""

    def __init__(self, scale):
        self.y_offset = np.asarray(scale["y_offset"][0, 0])
        self.y_factor = np.asarray(scale["y_factor"][0, 0])
        self.u_offset = np.asarray(scale["u_offset"][0, 0])
        self.u_factor = np.asarray(scale["u_factor"][0, 0])

    def scale_up(self, u=None, y=None):
        if y is not None:
            return y * self.y_factor + self.y_offset
        return u * self.u_factor + self.u_offset

    def scale_down(self, u=None, y=None):
        if y is not None:
            return (y - self.y_offset) / self.y_factor
        return (u - self.u_offset) / self.u_factor


class KoopmanData:
    """Online delay-embedding buffer (koopman_utils.py:8-47)."""

    def __init__(self, scale, delay):
        self.delay = delay
        self.scaling = KoopmanScaling(scale)
        self.y_norm = None
        self.u_norm = None

    def add_measurement(self, y, u):
        y = np.atleast_2d(self.scaling.scale_down(y=np.asarray(y)))
        u = np.atleast_2d(self.scaling.scale_down(u=np.asarray(u)))
        if self.y_norm is None:
            self.y_norm, self.u_norm = y, u
        else:
            self.y_norm = np.append(self.y_norm, y, axis=0)
            self.u_norm = np.append(self.u_norm, u, axis=0)

    def get_zeta(self, step=-1):
        if len(self.y_norm) < self.delay + 1:
            return None
        y = self.y_norm[step]
        u = self.u_norm[step]
        ydel = np.zeros(self.delay * self.y_norm.shape[1])
        udel = np.zeros(self.delay * self.u_norm.shape[1])
        for j in range(self.delay):
            ydel[self.y_norm.shape[1] * j:self.y_norm.shape[1] * (j + 1)] = \
                self.y_norm[step - (j + 1), :]
            udel[self.u_norm.shape[1] * j:self.u_norm.shape[1] * (j + 1)] = \
                self.u_norm[step - (j + 1), :]
        return np.hstack([y, ydel, udel])


class KoopmanOfflineData(KoopmanData):
    """Bulk zeta computation over a recorded run (koopman_utils.py:50-84)."""

    def __init__(self, scale, delay):
        super().__init__(scale, delay)
        self.y = None
        self.u = None
        self.t = None
        self.zeta = None

    def load_offline_data(self, file):
        from soft_robot_control_tpu.utils.io import load_data

        data = load_data(file)
        self.y = np.asarray(data["z"])
        self.t = np.asarray(data["t"])
        self.u = np.asarray(data["u"])
        self.y_norm = self.scaling.scale_down(y=self.y)
        self.u_norm = self.scaling.scale_down(u=self.u)

    def add_zeta_offline(self):
        self.zeta = np.asarray([self.get_zeta(step=i)
                                for i in range(self.delay, self.y_norm.shape[0])])


class KoopmanModel:
    """Lifted linear model from the MATLAB artifact (koopman_utils.py:110-176)."""

    def __init__(self, model_in, params_in, DMD=False):
        self.A_d = np.asarray(model_in["A"][0, 0])
        self.B_d = np.asarray(model_in["B"][0, 0])
        self.C = np.asarray(model_in["C"][0, 0])
        self.H = self.C.copy()
        self.M = model_in["M"][0, 0]
        self.K = model_in["K"][0, 0]
        names = model_in.dtype.names if hasattr(model_in, "dtype") else []
        self.V = (np.asarray(model_in["V"][0, 0]) if "V" in names
                  else np.eye(self.A_d.shape[0]))
        self.W = (np.asarray(model_in["W"][0, 0]) if "W" in names
                  else np.eye(self.A_d.shape[0]))

        def scalar(name):
            v = params_in[name]
            while isinstance(v, np.ndarray):
                v = v.ravel()[0]
            return v

        self.n = int(scalar("n"))
        self.m = int(scalar("m"))
        self.N = int(scalar("N"))
        self.state_dim = int(scalar("nzeta"))
        self.delays = int(scalar("delays"))
        self.obs_degree = int(scalar("obs_degree"))
        self.obs_type = str(params_in["obs_type"][0, 0][0, 0][0])
        self.Ts = float(scalar("Ts"))
        self.scale = params_in["scale"][0, 0]
        self.DMD = DMD

        self.assert_dimensions()
        if self.obs_type != "poly":
            raise NotImplementedError(self.obs_type)
        self._exps = koopman_exponents(self.state_dim, self.obs_degree,
                                       dmd=DMD)

    def assert_dimensions(self):
        assert self.A_d.shape == (self.N, self.N)
        assert self.B_d.shape == (self.N, self.m)
        assert self.C.shape == (self.n, self.N)

    def lift_data(self, *zeta):
        """phi(zeta): the lifted observable vector (jnp)."""
        z = jnp.asarray(zeta, dtype=jnp.result_type(float)).reshape(-1)
        return eval_monomials(z, self._exps)

    def lift_batch(self, Z):
        """(T, nzeta) -> (T, n_lift)."""
        return eval_monomials(jnp.asarray(Z), self._exps)

    def get_state_dim(self):
        return self.N

    def get_input_dim(self):
        return self.m


def koopman_model_from_arrays(A_d, B_d, C, n, m, nzeta, delays, obs_degree,
                              Ts, scale_dict, dmd=False) -> KoopmanModel:
    """Build a KoopmanModel from plain arrays (native EDMD training path,
    no MATLAB artifact). scale_dict: {y_offset, y_factor, u_offset,
    u_factor} plain arrays."""
    obj = KoopmanModel.__new__(KoopmanModel)
    obj.A_d = np.asarray(A_d)
    obj.B_d = np.asarray(B_d)
    obj.C = np.asarray(C)
    obj.H = obj.C.copy()
    obj.M = None
    obj.K = None
    obj.V = np.eye(obj.A_d.shape[0])
    obj.W = np.eye(obj.A_d.shape[0])
    obj.n = int(n)
    obj.m = int(m)
    obj.N = obj.A_d.shape[0]
    obj.state_dim = int(nzeta)
    obj.delays = int(delays)
    obj.obs_degree = int(obs_degree)
    obj.obs_type = "poly"
    obj.Ts = float(Ts)

    class _Scale(dict):
        def __getitem__(self, k):
            return np.asarray(dict.__getitem__(self, k)).reshape(1, 1, -1)

    # mimic the .mat nested indexing scale['y_offset'][0, 0]
    obj.scale = _Scale(scale_dict)
    obj.DMD = dmd
    obj.assert_dimensions()
    obj._exps = koopman_exponents(obj.state_dim, obj.obs_degree, dmd=dmd)
    return obj


class KoopmanObserver:
    """Trivial observer (koopman.py:188-193)."""

    def __init__(self):
        self.z = None
        self.x = None

    def update(self, u, y, dt, x=None):
        self.z = y


def train_edmd(zeta, u, degree: int, dmd: bool = False, reg: float = 0.0):
    """Native EDMD: fit x+ = A phi(zeta_k) + B u_k by (ridge) least squares,
    where x = phi(zeta). Replaces the MATLAB soft-robot-koopman training
    (generate_koopman_model.m). zeta: (T, nzeta) scaled delay-embedded
    measurements; u: (T, m) scaled inputs. Returns (A, B, C) with
    C recovering zeta from the lifted state (first nzeta observables)."""
    exps = koopman_exponents(zeta.shape[1], degree, dmd=dmd)
    Phi = np.asarray(eval_monomials(jnp.asarray(zeta), exps))
    X, Xp = Phi[:-1], Phi[1:]
    U = np.asarray(u)[:-1]
    G = np.hstack([X, U])
    # ridge-regularized normal equations
    A_aug = np.linalg.solve(G.T @ G + reg * np.eye(G.shape[1]),
                            G.T @ Xp).T
    n_lift = Phi.shape[1]
    A = A_aug[:, :n_lift]
    B = A_aug[:, n_lift:]
    C = np.zeros((zeta.shape[1], n_lift))
    C[:, :zeta.shape[1]] = np.eye(zeta.shape[1])
    return A, B, C
