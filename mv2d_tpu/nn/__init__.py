from . import resnet, fpn, rpn, rcnn, pe, query_generator, decoder  # noqa: F401
