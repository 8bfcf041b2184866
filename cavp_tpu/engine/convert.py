"""Torch <-> flax checkpoint conversion.

The parity bridge to the reference's released ``.pth`` checkpoints
(``test_avs_semantic.py:204-207``, ``test_avss_resize.py:230-235``,
pretrain loading via ``utils/pyt_utils.load_model:42-60``). Unlike the
reference's ``strict=False`` habit, conversion here is strict-by-default
and returns a full report of unmatched keys in both directions.

Naming contract (torch module tree -> flax param paths):

- ``backbone.backbone.conv1.{0,1,3,4,6}``  -> ResNet deep-stem
  stem_conv1/stem_bn1/stem_conv2/stem_bn2/stem_conv3
- ``backbone.backbone.layer{i}.{j}.*``     -> ``layer{i}_{j}.*``
  (conv1..3/bn1..3, downsample.0/1 -> downsample_conv/bn)
- ``segment.aspp.map_convs.{k}``           -> ``aspp.map_conv{k}`` etc.
- ``segment.reduce.{0,1}``                 -> reduce_conv / reduce_bn
- ``segment.upsample.last_conv.{0,1,3,4}`` -> last_conv0/last_bn0/...
- ``cross_att.*``, ``visual_projector.*``  -> 1:1 (blocks.0 -> block0)
- ``audio_backbone.backbone.features.{idx}`` (VGG conv Sequential
  indices 0,3,6,8,11,13) -> ``audio_net.net.conv{0..5}``;
  ``embeddings.{0,2,4}`` -> fc0/fc1/fc2;
  torchvision audio resnet18 stem/layers/fc -> ``audio_net.net.*``.

Weight layout: conv OIHW->HWIO, linear [out,in]->[in,out], BN
weight/bias -> scale/bias params and running_mean/var -> batch_stats.
DDP ``module.`` prefixes and the ``{"model": ...}`` wrapper are stripped
(engine/engine.py:91, pyt_utils.load_model:48-52).
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

# VGG "features" Sequential conv indices for cfg [64,M,128,M,256,256,M,512,512,M]
_VGG_CONV_IDX = {0: 0, 3: 1, 6: 2, 8: 3, 11: 4, 13: 5}
_STEM_IDX = {"0": "stem_conv1", "1": "stem_bn1", "3": "stem_conv2",
             "4": "stem_bn2", "6": "stem_conv3"}
_ASPP = {
    "map_bn": "aspp.map_bn", "global_pooling_conv": "aspp.global_pooling_conv",
    "global_pooling_bn": "aspp.global_pooling_bn", "red_conv": "aspp.red_conv",
    "pool_red_conv": "aspp.pool_red_conv", "red_bn": "aspp.red_bn",
}
_LAST_CONV = {"0": "last_conv0", "1": "last_bn0", "3": "last_conv1",
              "4": "last_bn1"}


def _translate_resnet(rest: str) -> Optional[str]:
    """backbone.backbone.<rest> -> flax ResNet path."""
    m = re.match(r"conv1\.(\d)\.(.*)", rest)
    if m:
        return f"{_STEM_IDX[m.group(1)]}.{m.group(2)}"
    if rest.startswith("bn1."):
        return rest
    m = re.match(r"layer(\d)\.(\d+)\.(.*)", rest)
    if m:
        stage, block, tail = m.groups()
        tail = tail.replace("downsample.0", "downsample_conv")
        tail = tail.replace("downsample.1", "downsample_bn")
        return f"layer{stage}_{block}.{tail}"
    return None


def _translate_audio(rest: str) -> Optional[str]:
    """audio_backbone.<rest> -> flax audio_net path."""
    if rest.startswith("cls_head."):
        return f"audio_net.cls_head.{rest.split('.', 1)[1]}"
    if not rest.startswith("backbone."):
        return None
    rest = rest.split(".", 1)[1]
    m = re.match(r"features\.(\d+)\.(.*)", rest)
    if m:
        idx = int(m.group(1))
        if idx not in _VGG_CONV_IDX:
            return None
        return f"audio_net.net.conv{_VGG_CONV_IDX[idx]}.{m.group(2)}"
    m = re.match(r"embeddings\.(\d)\.(.*)", rest)
    if m:
        return f"audio_net.net.fc{int(m.group(1)) // 2}.{m.group(2)}"
    # torchvision resnet18 audio tower
    m = re.match(r"layer(\d)\.(\d+)\.(.*)", rest)
    if m:
        stage, block, tail = m.groups()
        tail = tail.replace("downsample.0", "downsample_conv")
        tail = tail.replace("downsample.1", "downsample_bn")
        return f"audio_net.net.layer{stage}_{block}.{tail}"
    if rest.startswith(("conv1.", "bn1.", "fc.")):
        return f"audio_net.net.{rest}"
    return None


def _translate_segment(rest: str) -> Optional[str]:
    m = re.match(r"aspp\.map_convs\.(\d)\.(.*)", rest)
    if m:
        return f"segment.aspp.map_conv{m.group(1)}.{m.group(2)}"
    m = re.match(r"aspp\.(\w+)\.(.*)", rest)
    if m and m.group(1) in _ASPP:
        return f"segment.{_ASPP[m.group(1)]}.{m.group(2)}"
    m = re.match(r"reduce\.([01])\.(.*)", rest)
    if m:
        name = "reduce_conv" if m.group(1) == "0" else "reduce_bn"
        return f"segment.{name}.{m.group(2)}"
    m = re.match(r"upsample\.last_conv\.(\d)\.(.*)", rest)
    if m and m.group(1) in _LAST_CONV:
        return f"segment.upsample.{_LAST_CONV[m.group(1)]}.{m.group(2)}"
    m = re.match(r"upsample\.classifier\.(.*)", rest)
    if m:
        return f"segment.upsample.classifier.{m.group(1)}"
    return None


def _translate_hrnet_backbone(rest: str) -> Optional[str]:
    """HighResolutionNet torch names -> flax HRNetW48Backbone paths.

    torch (hrnet.py:287-646): conv1/bn1/conv2/bn2, layer1.N.*,
    transition{t}.{j}[.0].{0,1} (Sequential conv/bn; new-branch
    transitions nest one more Sequential), stage{s}.{m}.branches.{b}.{k}.*,
    stage{s}.{m}.fuse_layers.{i}.{j}[.{k}].{0,1}.
    """
    if rest.startswith(("conv1.", "bn1.", "conv2.", "bn2.")):
        return rest
    m = re.match(r"layer1\.(\d+)\.(.*)", rest)
    if m:
        tail = m.group(2).replace("downsample.0", "downsample_conv")
        tail = tail.replace("downsample.1", "downsample_bn")
        return f"layer1_{m.group(1)}.{tail}"
    m = re.match(r"transition(\d)\.(\d)\.(?:0\.)?([01])\.(.*)", rest)
    if m:
        t, j, cb, tail = m.groups()
        name = "conv" if cb == "0" else "bn"
        return f"transition{t}_{j}_{name}.{tail}"
    m = re.match(r"stage(\d)\.(\d+)\.branches\.(\d)\.(\d+)\.(.*)", rest)
    if m:
        s, mod, b, k, tail = m.groups()
        tail = tail.replace("downsample.0", "downsample_conv")
        tail = tail.replace("downsample.1", "downsample_bn")
        return f"stage{s}_module{mod}.branch{b}_block{k}.{tail}"
    m = re.match(r"stage(\d)\.(\d+)\.fuse_layers\.(\d)\.(\d)\.(.*)", rest)
    if m:
        s, mod, i, j, tail = m.groups()
        if int(j) > int(i):  # upsample path: Sequential(conv, bn)
            mm = re.match(r"([01])\.(.*)", tail)
            if not mm:
                return None
            name = "conv" if mm.group(1) == "0" else "bn"
            return f"stage{s}_module{mod}.fuse{i}_{j}_{name}.{mm.group(2)}"
        # downsample path: fuse_layers.i.j.{hop}.{0,1}.param
        mm = re.match(r"(\d)\.([01])\.(.*)", tail)
        if not mm:
            return None
        k, cb, t2 = mm.groups()
        name = f"conv{k}" if cb == "0" else f"bn{k}"
        return f"stage{s}_module{mod}.fuse{i}_{j}_{name}.{t2}"
    return None


def _translate_pvt(rest: str) -> Optional[str]:
    """PVT-v2 torch names -> flax PVTv2 paths (pvt.py:218-330)."""
    m = re.match(r"patch_embed(\d)\.proj\.(.*)", rest)
    if m:
        return f"patch_embed{m.group(1)}_proj.{m.group(2)}"
    m = re.match(r"patch_embed(\d)\.norm\.(.*)", rest)
    if m:
        return f"patch_embed{m.group(1)}_norm.{m.group(2)}"
    m = re.match(r"block(\d)\.(\d+)\.(.*)", rest)
    if m:
        i, j, tail = m.groups()
        tail = tail.replace("attn.sr.", "attn.sr.")
        tail = tail.replace("attn.norm.", "attn.norm.")
        tail = tail.replace("mlp.dwconv.dwconv.", "mlp.dwconv.")
        return f"block{i}_{j}.{tail}"
    m = re.match(r"norm(\d)\.(.*)", rest)
    if m:
        return rest
    return None


def _translate_ocr(rest: str) -> Optional[str]:
    """OCR head torch names -> flax OCRHead paths (ocrnet.py:19-75)."""
    m = re.match(r"conv3x3\.([01])\.(.*)", rest)
    if m:
        name = "conv" if m.group(1) == "0" else "bn"
        return f"segment.conv3x3.{name}.{m.group(2)}"
    m = re.match(
        r"ocr_distri_head\.object_context_block\.(f_pixel|f_object)\.([0134])\.(.*)",
        rest)
    if m:
        which, idx, tail = m.groups()
        sub = "0" if idx in ("0", "1") else "1"
        name = "conv" if idx in ("0", "3") else "bn"
        return f"segment.attention.{which}_{sub}.{name}.{tail}"
    m = re.match(
        r"ocr_distri_head\.object_context_block\.(f_down|f_up)\.([01])\.(.*)",
        rest)
    if m:
        which, idx, tail = m.groups()
        name = "conv" if idx == "0" else "bn"
        return f"segment.attention.{which}.{name}.{tail}"
    m = re.match(r"ocr_distri_head\.conv_bn_dropout\.([01])\.(.*)", rest)
    if m:
        name = "conv" if m.group(1) == "0" else "bn"
        return f"segment.bottleneck.{name}.{m.group(2)}"
    m = re.match(r"aux_head\.([013])\.(.*)", rest)
    if m:
        idx, tail = m.groups()
        if idx == "3":
            return f"segment.aux_cls.{tail}"
        name = "conv" if idx == "0" else "bn"
        return f"segment.aux_conv.{name}.{tail}"
    m = re.match(r"upsample\.(.*)", rest)
    if m:
        return f"segment.classifier.{m.group(1)}"
    return None


def _translate_fusion(key: str) -> Optional[str]:
    key = key.replace("blocks.0.", "block0.").replace("blocks.1.", "block1.")
    key = key.replace(".mlp.fc1.", ".mlp.fc1.").replace(".mlp.fc2.", ".mlp.fc2.")
    return key


def translate_torch_key(key: str, seg_model: str = "DeepLabV3Plus"
                        ) -> Optional[str]:
    """Torch CAVP state_dict key -> dotted flax path (collection-agnostic;
    the leaf suffix decides params vs batch_stats). None = untranslatable.

    ``seg_model`` disambiguates the head naming (a .pth does not label
    its architecture): DeepLabV3Plus / HRNet / OCR / PVT.
    """
    key = re.sub(r"^module\.", "", key)
    if key.endswith("num_batches_tracked"):
        return "<drop>"
    if key.startswith("backbone.backbone."):
        out = _translate_resnet(key[len("backbone.backbone."):])
        return f"backbone.{out}" if out else None
    if key.startswith("backbone."):
        rest = key[len("backbone."):]
        if seg_model == "PVT" or rest.startswith(("patch_embed", "block")):
            out = _translate_pvt(rest)
        else:
            out = _translate_hrnet_backbone(rest)
        return f"backbone.{out}" if out else None
    if key.startswith("segment."):
        rest = key[len("segment."):]
        if seg_model == "OCR":
            return _translate_ocr(rest)
        if seg_model == "HRNet":
            m = re.match(r"upsample\.last_conv\.([01])\.(.*)", rest)
            if m:
                name = "last_conv" if m.group(1) == "0" else "last_bn"
                return f"segment.{name}.{m.group(2)}"
            m = re.match(r"upsample\.classifier\.(.*)", rest)
            if m:
                return f"segment.classifier.{m.group(1)}"
            return None
        return _translate_segment(rest)
    if key.startswith("audio_backbone."):
        return _translate_audio(key[len("audio_backbone."):])
    if key.startswith(("cross_att.", "visual_projector.")):
        return _translate_fusion(key)
    if key.startswith("memory"):
        return "<drop>"  # model-level SoundBank buffer (dead code)
    return None


_LEAF_MAP = {
    "weight": ("params", None),        # kernel or scale, shape decides
    "bias": ("params", "bias"),
    "running_mean": ("batch_stats", "mean"),
    "running_var": ("batch_stats", "var"),
}


def import_torch_state_dict(
    state_dict: Dict[str, np.ndarray],
    params: Any,
    batch_stats: Any,
    seg_model: str = "DeepLabV3Plus",
) -> Tuple[Any, Any, Dict[str, List[str]]]:
    """Load a torch state dict into (params, batch_stats) pytrees.

    Returns (params, batch_stats, report) with report keys
    ``missing`` (flax leaves not filled), ``unexpected`` (torch keys with
    no target), ``converted``.
    """
    import flax

    flat_p = flax.traverse_util.flatten_dict(params, sep=".")
    flat_b = flax.traverse_util.flatten_dict(batch_stats, sep=".")
    filled = set()
    unexpected = []
    converted = []

    for tkey, value in state_dict.items():
        value = np.asarray(value)
        path = translate_torch_key(tkey, seg_model)
        if path == "<drop>":
            continue
        if path is None:
            unexpected.append(tkey)
            continue
        mod_path, leaf = path.rsplit(".", 1)
        if leaf == "weight":
            # decide kernel vs BN scale vs pos_embed by target existence
            if f"{mod_path}.kernel" in flat_p:
                tgt, name = flat_p, f"{mod_path}.kernel"
                if value.ndim == 4:
                    value = value.transpose(2, 3, 1, 0)  # OIHW -> HWIO
                elif value.ndim == 2:
                    value = value.T
                coll = "p"
            elif f"{mod_path}.scale" in flat_p:
                tgt, name, coll = flat_p, f"{mod_path}.scale", "p"
            else:
                unexpected.append(tkey)
                continue
        elif leaf == "bias":
            name, coll = f"{mod_path}.bias", "p"
            tgt = flat_p
        elif leaf == "running_mean":
            name, coll = f"{mod_path}.mean", "b"
            tgt = flat_b
        elif leaf == "running_var":
            name, coll = f"{mod_path}.var", "b"
            tgt = flat_b
        else:
            # direct param (pos_embed_v etc.)
            name, coll = path, "p"
            tgt = flat_p
            if name not in tgt:
                unexpected.append(tkey)
                continue
        if name not in tgt:
            unexpected.append(tkey)
            continue
        expected_shape = tuple(tgt[name].shape)
        if tuple(value.shape) != expected_shape:
            raise ValueError(
                f"shape mismatch for {tkey} -> {name}: "
                f"{value.shape} vs {expected_shape}")
        tgt[name] = value.astype(np.asarray(tgt[name]).dtype)
        filled.add((coll, name))
        converted.append(tkey)

    missing = [k for k in flat_p if ("p", k) not in filled]
    missing += [k for k in flat_b if ("b", k) not in filled]
    report = {"missing": missing, "unexpected": unexpected,
              "converted": converted}
    new_params = flax.traverse_util.unflatten_dict(flat_p, sep=".")
    new_bs = flax.traverse_util.unflatten_dict(flat_b, sep=".")
    return new_params, new_bs, report


def export_torch_state_dict(params: Any, batch_stats: Any,
                            seg_model: str = "DeepLabV3Plus"
                            ) -> Dict[str, np.ndarray]:
    """Inverse mapping: flax pytrees -> torch-named state dict (used by
    round-trip tests and for exporting back to the reference tooling).
    ``seg_model`` selects the head/backbone naming grammar, mirroring
    :func:`translate_torch_key`."""
    import flax

    flat_p = flax.traverse_util.flatten_dict(params, sep=".")
    flat_b = flax.traverse_util.flatten_dict(batch_stats, sep=".")

    # Build reverse index by enumerating plausible torch keys via the
    # forward translator over a candidate torch-name grammar.
    out: Dict[str, np.ndarray] = {}
    consumed = set()

    def try_put(tkey: str):
        path = translate_torch_key(tkey, seg_model)
        if path in (None, "<drop>"):
            return
        mod_path, leaf = path.rsplit(".", 1)
        if leaf == "weight":
            if f"{mod_path}.kernel" in flat_p:
                v = np.asarray(flat_p[f"{mod_path}.kernel"])
                v = v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
                out[tkey] = v
                consumed.add(f"{mod_path}.kernel")
            elif f"{mod_path}.scale" in flat_p:
                out[tkey] = np.asarray(flat_p[f"{mod_path}.scale"])
                consumed.add(f"{mod_path}.scale")
        elif leaf == "bias" and f"{mod_path}.bias" in flat_p:
            out[tkey] = np.asarray(flat_p[f"{mod_path}.bias"])
            consumed.add(f"{mod_path}.bias")
        elif leaf == "running_mean" and f"{mod_path}.mean" in flat_b:
            out[tkey] = np.asarray(flat_b[f"{mod_path}.mean"])
        elif leaf == "running_var" and f"{mod_path}.var" in flat_b:
            out[tkey] = np.asarray(flat_b[f"{mod_path}.var"])
        elif path in flat_p:
            out[tkey] = np.asarray(flat_p[path])
            consumed.add(path)

    for tkey in enumerate_torch_keys(flat_p, flat_b, seg_model):
        try_put(tkey)
    return out


def _inv_hrnet_backbone(rest: str) -> Optional[str]:
    """Inverse of :func:`_translate_hrnet_backbone` (flax module path
    under ``backbone.`` -> torch module prefix)."""
    if rest in ("conv1", "bn1", "conv2", "bn2"):
        return f"backbone.{rest}"
    m = re.match(r"layer1_(\d+)\.(.*)", rest)
    if m:
        tail = m.group(2).replace("downsample_conv", "downsample.0")
        tail = tail.replace("downsample_bn", "downsample.1")
        return f"backbone.layer1.{m.group(1)}.{tail}"
    m = re.match(r"transition(\d)_(\d)_(conv|bn)$", rest)
    if m:
        t, j, cb = m.groups()
        idx = "0" if cb == "conv" else "1"
        # the new branch of each transition (j == t) nests one more
        # Sequential in torch (hrnet.py transition construction)
        if int(j) == int(t):
            return f"backbone.transition{t}.{j}.0.{idx}"
        return f"backbone.transition{t}.{j}.{idx}"
    m = re.match(r"stage(\d)_module(\d+)\.branch(\d)_block(\d+)\.(.*)", rest)
    if m:
        s, mod, b, k, tail = m.groups()
        tail = tail.replace("downsample_conv", "downsample.0")
        tail = tail.replace("downsample_bn", "downsample.1")
        return f"backbone.stage{s}.{mod}.branches.{b}.{k}.{tail}"
    m = re.match(r"stage(\d)_module(\d+)\.fuse(\d)_(\d)_(conv|bn)(\d?)$", rest)
    if m:
        s, mod, i, j, cb, k = m.groups()
        idx = "0" if cb == "conv" else "1"
        base = f"backbone.stage{s}.{mod}.fuse_layers.{i}.{j}"
        if k:  # downsample hop (j < i)
            return f"{base}.{k}.{idx}"
        return f"{base}.{idx}"
    return None


def _inv_ocr_segment(rest: str) -> Optional[str]:
    """Inverse of :func:`_translate_ocr`."""
    m = re.match(r"conv3x3\.(conv|bn)$", rest)
    if m:
        return f"segment.conv3x3.{0 if m.group(1) == 'conv' else 1}"
    m = re.match(r"attention\.(f_pixel|f_object)_([01])\.(conv|bn)$", rest)
    if m:
        which, sub, cb = m.groups()
        idx = {("0", "conv"): 0, ("0", "bn"): 1,
               ("1", "conv"): 3, ("1", "bn"): 4}[(sub, cb)]
        return (f"segment.ocr_distri_head.object_context_block."
                f"{which}.{idx}")
    m = re.match(r"attention\.(f_down|f_up)\.(conv|bn)$", rest)
    if m:
        which, cb = m.groups()
        return (f"segment.ocr_distri_head.object_context_block."
                f"{which}.{0 if cb == 'conv' else 1}")
    m = re.match(r"bottleneck\.(conv|bn)$", rest)
    if m:
        return (f"segment.ocr_distri_head.conv_bn_dropout."
                f"{0 if m.group(1) == 'conv' else 1}")
    m = re.match(r"aux_conv\.(conv|bn)$", rest)
    if m:
        return f"segment.aux_head.{0 if m.group(1) == 'conv' else 1}"
    if rest == "aux_cls":
        return "segment.aux_head.3"
    if rest == "classifier":
        return "segment.upsample"
    return None


def _inv_pvt_backbone(rest: str) -> Optional[str]:
    """Inverse of :func:`_translate_pvt`."""
    m = re.match(r"patch_embed(\d)_(proj|norm)$", rest)
    if m:
        return f"backbone.patch_embed{m.group(1)}.{m.group(2)}"
    m = re.match(r"block(\d)_(\d+)\.(.*)", rest)
    if m:
        i, j, tail = m.groups()
        tail = tail.replace("mlp.dwconv", "mlp.dwconv.dwconv")
        return f"backbone.block{i}.{j}.{tail}"
    if re.match(r"norm(\d)$", rest):
        return f"backbone.{rest}"
    return None


def enumerate_torch_keys(flat_p, flat_b,
                         seg_model: str = "DeepLabV3Plus") -> List[str]:
    """Generate the torch key namespace corresponding to the flax leaves."""
    keys: List[str] = []

    def inv_module(mod: str) -> Optional[str]:
        # invert the per-module translations
        if mod.startswith("backbone."):
            rest = mod[len("backbone."):]
            if seg_model == "PVT":
                return _inv_pvt_backbone(rest)
            if seg_model in ("HRNet", "OCR"):
                return _inv_hrnet_backbone(rest)
            for t, f in _STEM_IDX.items():
                if rest == f:
                    return f"backbone.backbone.conv1.{t}"
            if rest == "bn1":
                return "backbone.backbone.bn1"
            m = re.match(r"layer(\d)_(\d+)\.(.*)", rest)
            if m:
                tail = m.group(3).replace("downsample_conv", "downsample.0")
                tail = tail.replace("downsample_bn", "downsample.1")
                return f"backbone.backbone.layer{m.group(1)}.{m.group(2)}.{tail}"
            m = re.match(r"layer(\d)_(\d+)$", rest)
            if m:
                return f"backbone.backbone.layer{m.group(1)}.{m.group(2)}"
            return None
        if mod.startswith("segment.") and seg_model == "OCR":
            return _inv_ocr_segment(mod[len("segment."):])
        if mod.startswith("segment.") and seg_model == "HRNet":
            rest = mod[len("segment."):]
            if rest == "last_conv":
                return "segment.upsample.last_conv.0"
            if rest == "last_bn":
                return "segment.upsample.last_conv.1"
            if rest == "classifier":
                return "segment.upsample.classifier"
            return None
        if mod.startswith("segment."):
            rest = mod[len("segment."):]
            m = re.match(r"aspp\.map_conv(\d)$", rest)
            if m:
                return f"segment.aspp.map_convs.{m.group(1)}"
            for t, f in _ASPP.items():
                if rest == f:
                    return f"segment.aspp.{t}"
            if rest == "reduce_conv":
                return "segment.reduce.0"
            if rest == "reduce_bn":
                return "segment.reduce.1"
            for t, f in _LAST_CONV.items():
                if rest == f"upsample.{f}":
                    return f"segment.upsample.last_conv.{t}"
            if rest == "upsample.classifier":
                return "segment.upsample.classifier"
            return None
        if mod.startswith("audio_net."):
            rest = mod[len("audio_net."):]
            if rest.startswith("cls_head"):
                return "audio_backbone.cls_head"
            assert rest.startswith("net.")
            rest = rest[4:]
            # "conv1" is ambiguous between the VGG tower's first conv
            # and the resnet18 stem — disambiguate by the tower actually
            # present in the param tree (resnet has layerN_M modules)
            audio_is_resnet = any(k.startswith("audio_net.net.layer")
                                  for k in flat_p)
            if not audio_is_resnet:
                m = re.match(r"conv(\d)$", rest)
                if m:
                    inv_vgg = {v: k for k, v in _VGG_CONV_IDX.items()}
                    return (f"audio_backbone.backbone.features."
                            f"{inv_vgg[int(m.group(1))]}")
                m = re.match(r"fc(\d)$", rest)
                if m:
                    return (f"audio_backbone.backbone.embeddings."
                            f"{int(m.group(1)) * 2}")
            m = re.match(r"layer(\d)_(\d+)\.(.*)", rest)
            if m:
                tail = m.group(3).replace("downsample_conv", "downsample.0")
                tail = tail.replace("downsample_bn", "downsample.1")
                return f"audio_backbone.backbone.layer{m.group(1)}.{m.group(2)}.{tail}"
            m = re.match(r"layer(\d)_(\d+)$", rest)
            if m:
                return f"audio_backbone.backbone.layer{m.group(1)}.{m.group(2)}"
            if rest in ("conv1", "bn1", "fc"):
                return f"audio_backbone.backbone.{rest}"
            return None
        if mod.startswith("cross_att.") or mod.startswith("visual_projector"):
            return mod.replace("block0.", "blocks.0.").replace(
                "block1.", "blocks.1.")
        return None

    leaf_inv = {"kernel": "weight", "scale": "weight", "bias": "bias",
                "mean": "running_mean", "var": "running_var"}
    for flat, leaves in ((flat_p, ("kernel", "scale", "bias")),
                         (flat_b, ("mean", "var"))):
        for k in flat:
            mod, leaf = k.rsplit(".", 1)
            if leaf in leaves:
                t = inv_module(mod)
                if t:
                    keys.append(f"{t}.{leaf_inv[leaf]}")
            elif k.startswith("cross_att."):
                keys.append(k.replace("block0.", "blocks.0."))
    return keys


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth file (reference save format: {"model": state_dict, ...},
    engine/engine.py:72-100) into a numpy dict."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and "model" in ckpt:
        ckpt = ckpt["model"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in ckpt.items()}
