"""Checkpointing: orbax save/resume + torch .pth -> JAX weight conversion.

Replaces the mmcv CheckpointHook / load_checkpoint flow (ref:
configs/_base_/default_runtime.py:1, tools/train.py:251-261,
tools/test.py:225) and provides a converter for the reference's released
mmdet/mmdet3d checkpoints (nuImages-pretrained Faster/Mask R-CNN and full
MV2D .pth files) into this framework's parameter tree.
"""
from __future__ import annotations

import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

# --------------------------------------------------------------- orbax


def save_checkpoint(path: str, state: Any, step: int | None = None):
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def restore_checkpoint(path: str, template: Any) -> Any:
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), template)


def restore_variables(path: str, variables: Dict[str, Any]) -> Dict[str, Any]:
    """Restore eval variables {'params', 'constants'} from a checkpoint that
    holds either a bare variables dict or a full TrainState (tools/train.py
    saves the TrainState with opt_state+step; the reference's test.py
    likewise loads weights out of a training checkpoint,
    ref: tools/test.py:225 load_checkpoint).
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    try:
        return ckptr.restore(path, variables)
    except Exception:
        pass
    raw = ckptr.restore(path)   # structure-free restore (nested dicts)
    out = {}
    for k, tmpl in variables.items():
        if isinstance(raw, dict) and k in raw and raw[k] is not None:
            out[k] = jax.tree.map(
                lambda t, s: jnp.asarray(s).astype(t.dtype), tmpl, raw[k])
        else:
            out[k] = tmpl
    return out


# ----------------------------------------------------- torch -> JAX mapping

def _conv(w):    # OIHW -> HWIO
    return np.transpose(w, (2, 3, 1, 0))


def _lin(w):     # [out, in] -> [in, out]
    return np.transpose(w, (1, 0))


def _map_resnet(key: str) -> Optional[Tuple[str, str]]:
    """'backbone.*' torch key -> (flax path under backbone/, kind)."""
    m = re.match(r'backbone\.conv1\.weight', key)
    if m:
        return 'stem_conv/kernel', 'conv'
    m = re.match(r'backbone\.bn1\.(\w+)', key)
    if m:
        return f'stem_bn/{_bn_leaf(m.group(1))}', 'bn'
    m = re.match(r'backbone\.layer(\d)\.(\d+)\.(.*)', key)
    if not m:
        return None
    st, blk, rest = int(m.group(1)), int(m.group(2)), m.group(3)
    base = f'layer{st}_{blk}'
    mm = re.match(r'conv(\d)\.weight', rest)
    if mm:
        return f'{base}/conv{mm.group(1)}/kernel', 'conv'
    mm = re.match(r'conv2\.conv_offset\.(weight|bias)', rest)
    if mm:
        leaf = 'kernel' if mm.group(1) == 'weight' else 'bias'
        return f'{base}/conv2/conv_offset/{leaf}', \
            'conv' if leaf == 'kernel' else 'raw'
    mm = re.match(r'bn(\d)\.(\w+)', rest)
    if mm:
        return f'{base}/bn{mm.group(1)}/{_bn_leaf(mm.group(2))}', 'bn'
    mm = re.match(r'downsample\.0\.weight', rest)
    if mm:
        return f'{base}/downsample_conv/kernel', 'conv'
    mm = re.match(r'downsample\.1\.(\w+)', rest)
    if mm:
        return f'{base}/downsample_bn/{_bn_leaf(mm.group(1))}', 'bn'
    return None


def _bn_leaf(name: str) -> str:
    return {'weight': 'scale', 'bias': 'bias', 'running_mean': 'mean',
            'running_var': 'var'}.get(name, name)


def _map_vovnet(key: str) -> Optional[Tuple[str, str]]:
    """'backbone.*' VoVNetCP torch key -> (flax path under backbone/, kind).

    Reference naming (models/backbones/vovnetcp.py:101-163, 319-336):
    'stem.stem_1/conv.weight', 'stage3.OSA3_2.layers.0.OSA3_2_0/conv.weight',
    'stage3.OSA3_2.concat.OSA3_2_concat/norm.running_mean',
    'stage3.OSA3_2.ese.fc.weight'.  Stems are 1-indexed, OSA blocks
    1-indexed; the flax tree is 0-indexed (nn/vovnet.py)."""
    m = re.match(r'backbone\.stem\.stem_(\d)/conv\.weight', key)
    if m:
        return f'stem_{int(m.group(1)) - 1}/conv/kernel', 'conv'
    m = re.match(r'backbone\.stem\.stem_(\d)/norm\.(\w+)', key)
    if m:
        return f'stem_{int(m.group(1)) - 1}/bn/{_bn_leaf(m.group(2))}', 'bn'
    m = re.match(r'backbone\.stage(\d)\.OSA\d+_(\d+)\.(.*)', key)
    if not m:
        return None
    st, blk, rest = int(m.group(1)), int(m.group(2)) - 1, m.group(3)
    base = f'stage{st}_{blk}'
    mm = re.match(r'layers\.(\d+)\.OSA\d+_\d+_\d+/conv\.weight', rest)
    if mm:
        return f'{base}/layer_{mm.group(1)}/conv/kernel', 'conv'
    mm = re.match(r'layers\.(\d+)\.OSA\d+_\d+_\d+/norm\.(\w+)', rest)
    if mm:
        return f'{base}/layer_{mm.group(1)}/bn/{_bn_leaf(mm.group(2))}', 'bn'
    mm = re.match(r'concat\.OSA\d+_\d+_concat/conv\.weight', rest)
    if mm:
        return f'{base}/concat/conv/kernel', 'conv'
    mm = re.match(r'concat\.OSA\d+_\d+_concat/norm\.(\w+)', rest)
    if mm:
        return f'{base}/concat/bn/{_bn_leaf(mm.group(1))}', 'bn'
    mm = re.match(r'ese\.fc\.(weight|bias)', rest)
    if mm:
        leaf = 'kernel' if mm.group(1) == 'weight' else 'bias'
        return f'{base}/ese/fc/{leaf}', 'conv' if leaf == 'kernel' else 'raw'
    return None


def _map_fpn(key: str, start_level: int = 0) -> Optional[Tuple[str, str]]:
    m = re.match(r'neck\.lateral_convs\.(\d+)\.conv\.(weight|bias)', key)
    if m:
        lvl = int(m.group(1)) + start_level
        leaf = 'kernel' if m.group(2) == 'weight' else 'bias'
        return f'lateral_{lvl}/{leaf}', 'conv' if leaf == 'kernel' else 'raw'
    m = re.match(r'neck\.fpn_convs\.(\d+)\.conv\.(weight|bias)', key)
    if m:
        lvl = int(m.group(1)) + start_level
        leaf = 'kernel' if m.group(2) == 'weight' else 'bias'
        return f'fpn_{lvl}/{leaf}', 'conv' if leaf == 'kernel' else 'raw'
    return None


def _set(tree: Dict, path: str, value):
    parts = path.split('/')
    d = tree
    for p in parts[:-1]:
        d = d.setdefault(p, {})
    d[parts[-1]] = value


def convert_torch_state_dict(state_dict: Dict[str, np.ndarray]
                             ) -> Tuple[Dict, Dict]:
    """Full MV2D (or plain mmdet detector) torch state dict ->
    (params, constants) nested dicts in this framework's layout.

    Handles: ResNet (+DCN offsets), FPNs (detector + p4 neck), RPN, RCNN
    Shared2FC head, query generator, PE, decoder (packed in_proj split into
    q/k/v), cls/reg branches.  Unknown keys are collected under
    params['_unmatched'] count for the caller to report.
    """
    params: Dict = {}
    constants: Dict = {}
    unmatched = []

    def put(path, value, kind):
        v = np.asarray(value)
        if kind == 'conv':
            v = _conv(v)
        elif kind == 'lin':
            v = _lin(v)
        if path.endswith('/mean') or path.endswith('/var'):
            _set(constants, path, v)
        else:
            _set(params, path, v)

    # decoder attention packed projections: collect then split
    packed: Dict[str, np.ndarray] = {}

    for key, val in state_dict.items():
        val = np.asarray(val)
        if key.startswith(('stem.', 'stage2.', 'stage3.', 'stage4.',
                           'stage5.', 'backbone.stem.', 'backbone.stage')):
            # standalone VoVNet checkpoint (loaded into the backbone via
            # init_cfg Pretrained in the reference: vovnetcp.py:288), with
            # or without the 'backbone.' prefix
            bk = key if key.startswith('backbone.') else 'backbone.' + key
            m = _map_vovnet(bk)
            if m:
                put(f'base_detector/backbone/{m[0]}', val, m[1])
                continue
            unmatched.append(key)
            continue

        if key.startswith('base_detector.'):
            sub = key[len('base_detector.'):]
            m = _map_resnet(sub) or _map_vovnet(sub)
            if m:
                put(f'base_detector/backbone/{m[0]}', val, m[1])
                continue
            m = _map_fpn(sub)
            if m:
                put(f'base_detector/fpn/{m[0]}', val, m[1])
                continue
            mm = re.match(r'rpn_head\.rpn_(conv|cls|reg)\.(weight|bias)', sub)
            if mm:
                leaf = 'kernel' if mm.group(2) == 'weight' else 'bias'
                put(f'base_detector/rpn_head/rpn_{mm.group(1)}/{leaf}', val,
                    'conv' if leaf == 'kernel' else 'raw')
                continue
            mm = re.match(
                r'roi_head\.bbox_head\.shared_fcs\.(\d)\.(weight|bias)', sub)
            if mm:
                leaf = 'kernel' if mm.group(2) == 'weight' else 'bias'
                idx = int(mm.group(1))
                if idx == 0 and leaf == 'kernel':
                    # fc0 consumes the FLATTENED RoI features: torch
                    # flattens (C, 7, 7), the flax head flattens (7, 7, C)
                    # - permute the input dim accordingly
                    out_d, in_d = val.shape
                    C = in_d // 49
                    val = val.reshape(out_d, C, 7, 7).transpose(0, 2, 3, 1) \
                        .reshape(out_d, in_d)
                put(f'base_detector/bbox_head/shared_fc{idx + 1}'
                    f'/{leaf}', val, 'lin' if leaf == 'kernel' else 'raw')
                continue
            mm = re.match(r'roi_head\.bbox_head\.fc_(cls|reg)\.(weight|bias)',
                          sub)
            if mm:
                leaf = 'kernel' if mm.group(2) == 'weight' else 'bias'
                put(f'base_detector/bbox_head/fc_{mm.group(1)}/{leaf}', val,
                    'lin' if leaf == 'kernel' else 'raw')
                continue
            unmatched.append(key)
            continue

        if key.startswith('neck.'):       # the p4-selecting neck (start lvl 2)
            m = _map_fpn(key, start_level=2)
            if m:
                put(f'neck/{m[0]}', val, m[1])
                continue
            unmatched.append(key)
            continue

        if key.startswith('roi_head.query_generator.'):
            sub = key[len('roi_head.query_generator.'):]
            table = [
                (r'shared_convs\.0\.conv\.(weight|bias)',
                 'query_generator/shared_conv', 'conv'),
                (r'shared_fcs\.0\.(weight|bias)',
                 'query_generator/shared_fc', 'lin'),
                (r'extra_enc\.0\.(weight|bias)',
                 'query_generator/extra_enc_0', 'lin'),
                (r'extra_enc\.2\.(weight|bias)',
                 'query_generator/extra_enc_1', 'lin'),
                (r'fc_center\.(weight|bias)',
                 'query_generator/fc_center', 'lin'),
            ]
            if _try_table(sub, val, table, put):
                continue
            unmatched.append(key)
            continue

        if key.startswith('roi_head.position_encoding.'):
            sub = key[len('roi_head.position_encoding.'):]
            table = [
                (r'position_encoder\.0\.(weight|bias)',
                 'pe/position_encoder_0', 'conv'),
                (r'position_encoder\.2\.(weight|bias)',
                 'pe/position_encoder_1', 'conv'),
                (r'adapt_pos3d\.0\.(weight|bias)', 'pe/adapt_pos3d_0',
                 'conv'),
                (r'adapt_pos3d\.2\.(weight|bias)', 'pe/adapt_pos3d_1',
                 'conv'),
                (r'fpe\.conv_reduce\.(weight|bias)', 'pe/fpe/conv_reduce',
                 'conv'),
                (r'fpe\.conv_expand\.(weight|bias)', 'pe/fpe/conv_expand',
                 'conv'),
            ]
            if _try_table(sub, val, table, put):
                continue
            unmatched.append(key)
            continue

        if key.startswith('roi_head.bbox_head.'):
            sub = key[len('roi_head.bbox_head.'):]
            table = [
                (r'query_embedding\.0\.(weight|bias)',
                 'bbox_head/query_embedding_0', 'lin'),
                (r'query_embedding\.2\.(weight|bias)',
                 'bbox_head/query_embedding_1', 'lin'),
                (r'transformer\.decoder\.post_norm\.(weight|bias)',
                 'bbox_head/decoder/post_norm', 'ln'),
            ]
            if _try_table(sub, val, table, put):
                continue
            m = re.match(r'transformer\.decoder\.layers\.(\d+)\.(.*)', sub)
            if m:
                lyr, rest = int(m.group(1)), m.group(2)
                base = f'bbox_head/decoder/layer_{lyr}'
                if _map_decoder_layer(base, rest, val, put, packed):
                    continue
            m = re.match(r'cls_branches\.(\d+)\.(\d+)\.(weight|bias)', sub)
            if m:
                lyr, idx, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
                name = {0: 'fc0', 1: 'ln0', 3: 'fc1', 4: 'ln1', 6: 'out'}[idx]
                kind = 'lin' if (leaf == 'weight' and 'ln' not in name) \
                    else 'raw'
                lf = _ln_leaf(leaf) if 'ln' in name else \
                    ('kernel' if leaf == 'weight' else 'bias')
                put(f'bbox_head/cls_branch_{lyr}/{name}/{lf}', val, kind)
                continue
            m = re.match(r'reg_branches\.(\d+)\.(\d+)\.(weight|bias)', sub)
            if m:
                lyr, idx, leaf = int(m.group(1)), int(m.group(2)), m.group(3)
                name = {0: 'fc0', 2: 'fc1', 4: 'out'}[idx]
                kind = 'lin' if leaf == 'weight' else 'raw'
                lf = 'kernel' if leaf == 'weight' else 'bias'
                put(f'bbox_head/reg_branch_{lyr}/{name}/{lf}', val, kind)
                continue
            unmatched.append(key)
            continue

        if key in ('roi_head.bbox_head.code_weights', 'code_weights') or \
                key.endswith('num_batches_tracked'):
            continue
        unmatched.append(key)

    # split packed in_proj q/k/v
    for base, w in list(packed.items()):
        if base.endswith('in_proj_weight'):
            tgt = base[:-len('/in_proj_weight')]
            q, k, v = np.split(w, 3, axis=0)
            for n, m_ in (('q_proj', q), ('k_proj', k), ('v_proj', v)):
                _set(params, f'{tgt}/{n}/kernel', _lin(m_))
        elif base.endswith('in_proj_bias'):
            tgt = base[:-len('/in_proj_bias')]
            q, k, v = np.split(w, 3, axis=0)
            for n, m_ in (('q_proj', q), ('k_proj', k), ('v_proj', v)):
                _set(params, f'{tgt}/{n}/bias', m_)

    params['_unmatched'] = len(unmatched)
    params['_unmatched_keys'] = unmatched[:50]
    return params, constants


def _ln_leaf(leaf: str) -> str:
    return 'scale' if leaf == 'weight' else 'bias'


def _try_table(sub: str, val, table, put) -> bool:
    """Match `sub` against (pattern, target_prefix, kind) rules; the pattern's
    group(1) is 'weight'|'bias'."""
    for pattern, target, kind in table:
        m = re.match(pattern, sub)
        if not m:
            continue
        leaf_t = m.group(1)
        if kind == 'ln':
            put(f'{target}/{_ln_leaf(leaf_t)}', val, 'raw')
        else:
            leaf = 'kernel' if leaf_t == 'weight' else 'bias'
            put(f'{target}/{leaf}', val,
                kind if leaf_t == 'weight' else 'raw')
        return True
    return False


def _map_decoder_layer(base: str, rest: str, val, put, packed) -> bool:
    """One PETRTransformerDecoderLayer's torch params -> flax layer tree.

    torch layout (mmcv BaseTransformerLayer): attentions.0 = self-attn
    (FlattenMHSelfAttention), attentions.1 = cross-attn
    (PETRMultiheadAttention), ffns.0.layers.{0.0, 1} = the two FFN linears,
    norms.{0,1,2} = the three LayerNorms.
    """
    m = re.match(r'attentions\.(\d)\.attn\.in_proj_(weight|bias)', rest)
    if m:
        which = 'self_attn' if m.group(1) == '0' else 'cross_attn'
        packed[f'{base}/{which}/in_proj_{m.group(2)}'] = np.asarray(val)
        return True
    m = re.match(r'attentions\.(\d)\.attn\.out_proj\.(weight|bias)', rest)
    if m:
        which = 'self_attn' if m.group(1) == '0' else 'cross_attn'
        leaf = 'kernel' if m.group(2) == 'weight' else 'bias'
        put(f'{base}/{which}/out_proj/{leaf}', val,
            'lin' if leaf == 'kernel' else 'raw')
        return True
    m = re.match(r'ffns\.0\.layers\.0\.0\.(weight|bias)', rest)
    if m:
        leaf = 'kernel' if m.group(1) == 'weight' else 'bias'
        put(f'{base}/ffn/fc1/{leaf}', val,
            'lin' if leaf == 'kernel' else 'raw')
        return True
    m = re.match(r'ffns\.0\.layers\.1\.(weight|bias)', rest)
    if m:
        leaf = 'kernel' if m.group(1) == 'weight' else 'bias'
        put(f'{base}/ffn/fc2/{leaf}', val,
            'lin' if leaf == 'kernel' else 'raw')
        return True
    m = re.match(r'norms\.(\d)\.(weight|bias)', rest)
    if m:
        put(f'{base}/norm{int(m.group(1)) + 1}/{_ln_leaf(m.group(2))}',
            val, 'raw')
        return True
    return False
