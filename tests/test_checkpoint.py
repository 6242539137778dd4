import numpy as np

from mv2d_tpu.train import checkpoint as ck


def fake_torch_sd(rng):
    """Representative mmdet/MV2D-named state dict fragment."""
    sd = {}

    def add(name, shape):
        sd[name] = rng.normal(size=shape).astype(np.float32)

    add('base_detector.backbone.conv1.weight', (64, 3, 7, 7))
    for leaf in ('weight', 'bias', 'running_mean', 'running_var'):
        add(f'base_detector.backbone.bn1.{leaf}', (64,))
    add('base_detector.backbone.layer1.0.conv2.weight', (64, 64, 3, 3))
    add('base_detector.backbone.layer1.0.downsample.0.weight',
        (256, 64, 1, 1))
    add('base_detector.backbone.layer1.0.downsample.1.running_var', (256,))
    add('base_detector.neck.lateral_convs.0.conv.weight', (256, 256, 1, 1))
    add('base_detector.neck.fpn_convs.1.conv.bias', (256,))
    add('base_detector.rpn_head.rpn_cls.weight', (3, 256, 1, 1))
    add('base_detector.roi_head.bbox_head.shared_fcs.0.weight', (1024, 12544))
    add('base_detector.roi_head.bbox_head.fc_cls.weight', (11, 1024))
    add('neck.lateral_convs.0.conv.weight', (256, 256, 1, 1))
    add('roi_head.query_generator.shared_fcs.0.weight', (1024, 256))
    add('roi_head.query_generator.fc_center.bias', (3,))
    add('roi_head.position_encoding.position_encoder.0.weight',
        (1024, 192, 1, 1))
    add('roi_head.position_encoding.fpe.conv_reduce.weight', (256, 256, 1, 1))
    add('roi_head.bbox_head.query_embedding.0.weight', (256, 384))
    add('roi_head.bbox_head.transformer.decoder.layers.0.attentions.0.attn.'
        'in_proj_weight', (768, 256))
    add('roi_head.bbox_head.transformer.decoder.layers.0.attentions.1.attn.'
        'out_proj.weight', (256, 256))
    add('roi_head.bbox_head.transformer.decoder.layers.0.ffns.0.layers.0.0.'
        'weight', (2048, 256))
    add('roi_head.bbox_head.transformer.decoder.layers.0.norms.2.weight',
        (256,))
    add('roi_head.bbox_head.transformer.decoder.post_norm.weight', (256,))
    add('roi_head.bbox_head.cls_branches.0.1.weight', (256,))   # LN
    add('roi_head.bbox_head.cls_branches.0.6.weight', (10, 256))
    add('roi_head.bbox_head.reg_branches.0.4.weight', (10, 256))
    return sd


def test_convert_torch_state_dict(rng):
    sd = fake_torch_sd(rng)
    params, constants = ck.convert_torch_state_dict(sd)
    assert params['_unmatched'] == 0, params['_unmatched_keys']
    # conv OIHW -> HWIO
    k = params['base_detector']['backbone']['stem_conv']['kernel']
    assert k.shape == (7, 7, 3, 64)
    np.testing.assert_allclose(
        k[0, 0, 0, :], sd['base_detector.backbone.conv1.weight'][:, 0, 0, 0])
    # BN stats land in constants
    assert constants['base_detector']['backbone']['stem_bn']['var'].shape \
        == (64,)
    assert 'scale' in params['base_detector']['backbone']['stem_bn']
    # linear transpose
    fc = params['base_detector']['bbox_head']['shared_fc1']['kernel']
    assert fc.shape == (12544, 1024)
    # packed in_proj split
    sa = params['bbox_head']['decoder']['layer_0']['self_attn']
    assert sa['q_proj']['kernel'].shape == (256, 256)
    np.testing.assert_allclose(
        sa['k_proj']['kernel'],
        sd['roi_head.bbox_head.transformer.decoder.layers.0.attentions.0.'
           'attn.in_proj_weight'][256:512].T)
    # neck start-level offset: lateral_convs.0 -> lateral_2
    assert 'lateral_2' in params['neck']
    # cls branch LN vs Linear
    cb = params['bbox_head']['cls_branch_0']
    assert cb['ln0']['scale'].shape == (256,)
    assert cb['out']['kernel'].shape == (256, 10)


def test_orbax_roundtrip(tmp_path, rng):
    state = {'a': np.arange(6, dtype=np.float32).reshape(2, 3),
             'nested': {'b': np.ones((4,), np.float32)}}
    path = str(tmp_path / 'ckpt')
    ck.save_checkpoint(path, state)
    import jax
    template = jax.tree.map(np.zeros_like, state)
    restored = ck.restore_checkpoint(path, template)
    np.testing.assert_allclose(restored['a'], state['a'])
    np.testing.assert_allclose(restored['nested']['b'], state['nested']['b'])


def test_convert_vovnet_keys(rng):
    """VoVNetCP torch keys (ref vovnetcp.py naming) -> nn/vovnet.py tree:
    every converted path must exist in a real flax init with equal shape."""
    import jax
    import jax.numpy as jnp
    from mv2d_tpu.nn.vovnet import VoVNet

    model = VoVNet(depth=19)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 64, 64, 3)))

    sd = {}

    def add(name, shape):
        sd[name] = rng.normal(size=shape).astype(np.float32)

    # V2-19: stem (64, 64, 128), conv_ch (128,...), out (256,...), 3 layers
    add('backbone.stem.stem_1/conv.weight', (64, 3, 3, 3))
    for leaf in ('weight', 'bias', 'running_mean', 'running_var'):
        add(f'backbone.stem.stem_1/norm.{leaf}', (64,))
    add('backbone.stem.stem_3/conv.weight', (128, 64, 3, 3))
    add('backbone.stage2.OSA2_1.layers.0.OSA2_1_0/conv.weight',
        (128, 128, 3, 3))
    add('backbone.stage2.OSA2_1.layers.2.OSA2_1_2/conv.weight',
        (128, 128, 3, 3))
    add('backbone.stage2.OSA2_1.layers.1.OSA2_1_1/norm.running_mean', (128,))
    add('backbone.stage2.OSA2_1.concat.OSA2_1_concat/conv.weight',
        (256, 128 + 3 * 128, 1, 1))
    add('backbone.stage2.OSA2_1.concat.OSA2_1_concat/norm.weight', (256,))
    add('backbone.stage2.OSA2_1.ese.fc.weight', (256, 256, 1, 1))
    add('backbone.stage2.OSA2_1.ese.fc.bias', (256,))
    add('backbone.stage5.OSA5_1.layers.0.OSA5_1_0/conv.weight',
        (224, 768, 3, 3))

    # under the base_detector prefix AND as a standalone backbone ckpt
    for prefix in ('base_detector.', ''):
        params, constants = ck.convert_torch_state_dict(
            {prefix + k: v for k, v in sd.items()})
        assert params['_unmatched'] == 0, params['_unmatched_keys']
        bb_p = params['base_detector']['backbone']
        bb_c = constants['base_detector']['backbone']
        ref_p = variables['params']
        ref_c = variables['constants']

        def check(tree, ref, path=''):
            for k, v in tree.items():
                assert k in ref, f'{path}/{k} not in flax init'
                if isinstance(v, dict):
                    check(v, ref[k], f'{path}/{k}')
                else:
                    assert np.asarray(v).shape == np.asarray(ref[k]).shape, \
                        (path, k, np.asarray(v).shape,
                         np.asarray(ref[k]).shape)

        check(bb_p, ref_p)
        check(bb_c, ref_c)
        # OIHW -> HWIO on the ese 1x1
        np.testing.assert_allclose(
            bb_p['stage2_0']['ese']['fc']['kernel'][0, 0],
            sd['backbone.stage2.OSA2_1.ese.fc.weight'][:, :, 0, 0].T)
