"""SSM manifold observer: algebraic projection of the measured output through
the parametrization map, x = W_map(z - z_ref)
(sofacontrol/SSM/controllers.py:302-310)."""

from __future__ import annotations

import jax.numpy as jnp

from soft_robot_control_tpu.core.packing import vq2qv


class SSMObserver:
    def __init__(self, dyn_sys):
        self.dyn_sys = dyn_sys
        self.x = None
        self.z = None

    def initialize(self, xf=None):
        pass

    def update(self, u, y, dt, x=None):
        """y is the raw measurement in [v; q] packing; the SSM convention is
        [q; v] (the reference applies vq2qv, SSM/controllers.py:309)."""
        self.z = vq2qv(jnp.asarray(y))
        self.x = self.dyn_sys.W_map(self.dyn_sys.zfyf_to_zy(self.z))
