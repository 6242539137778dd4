import os


def pallas_enabled() -> bool:
    """True when the hand-written TPU kernels should be routed.

    Kernels run on the real TPU backend only; MV2D_NO_PALLAS=1 forces the
    XLA fallbacks everywhere (the kernels use manual DMA + ANY memory
    space, which jax.vmap cannot batch - scene-batched throughput probes
    need the pure-XLA program).
    """
    import jax
    return (jax.default_backend() == 'tpu'
            and not os.environ.get('MV2D_NO_PALLAS'))


from . import roi_align, attention, focal_loss, grid_mask  # noqa: F401,E402
