"""TPU-native Lie group library (SO3 / SE3 / Sim3 on raw JAX arrays).

Replaces the reference's lietorch CUDA extension
(VO_Module/thirdparty/lietorch) with pure-JAX closed-form ops: everything is
jit/vmap/grad friendly, no custom autograd needed because the maps are
compositions of differentiable primitives (Taylor-guarded near singularities).
"""

from . import se3, sim3, so3

__all__ = ["so3", "se3", "sim3"]
