"""Pure, shape-static geometry and kernel ops (jnp + Pallas)."""

from x_detector_tpu.ops import boxes, anchors, matching, nms  # noqa: F401
