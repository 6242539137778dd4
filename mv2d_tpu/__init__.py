"""mv2d_tpu: a TPU-native multi-view camera-only 3D detection framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of tusen-ai/MV2D
("Object as Query: Lifting any 2D Object Detector to 3D Detection", ICCV 2023),
including the slice of the mmcv/mmdet/mmdet3d stack the reference plugin
depends on (ResNet+FPN+Faster R-CNN, RoIAlign, NMS, focal loss, DETR-style
decoder, Hungarian matching, nuScenes dataset/eval tooling).

Design principles (TPU-first, not a port):
  * every compiled program has static shapes: detections, queries, DN pads and
    attention key sets live in fixed-size buckets with validity masks,
  * hot ops (backbone convs, RoIAlign, masked decoder attention) map onto the
    MXU; correlation masks are built with boolean matmuls instead of ragged
    gathers,
  * float64 camera-matrix inversions are hoisted to the host data pipeline;
    per-RoI virtual-intrinsic inverses use a well-conditioned analytic form,
  * scale-out is jax.sharding Mesh + data parallelism (the reference uses pure
    DDP: /root/reference/configs/_base_/default_runtime.py:13).
"""

__version__ = "0.1.0"
