"""Loss layer (pure-functional JAX).

Capability of reference ``opencood/loss``: each loss is a callable
``(output_dict, target_dict, suffix) -> (total, aux dict)`` registered by
its config ``core_method`` name.
"""
from . import center_point_loss  # noqa: F401
from . import fpvrcnn_loss  # noqa: F401
from . import pixor_loss  # noqa: F401
from . import point_pillar_disconet_loss  # noqa: F401
from . import point_pillar_loss  # noqa: F401
from . import voxel_net_loss  # noqa: F401
from . import point_pillar_pyramid_loss  # noqa: F401
from . import point_pillar_uncertainty_loss  # noqa: F401
from ..models.registry import build_loss

__all__ = ["build_loss"]
