"""Config-driven pretrained-weight bootstrap (VERDICT #8).

Mirrors the reference's three pretrained entry points:

- ``model_kwargs.pretrained`` — EDSR's public-checkpoint load
  (reference utils/common_config.py:100-102 -> utils/utils.py:338-349):
  a FOREIGN torch file whose module names differ is matched to the model
  purely by tensor position (``pair_state_dict``), then applied
  shape-filtered (the reference's ``load_state_dict`` update,
  utils/utils.py:352-370). ``True`` uses the model's default path
  (reference models/EDSR.py:87 ``./models/pretrained/EDSR-b32f128x2.bin``);
  a string is used as the path directly.
- ``model_kwargs.pvt_pretrained`` — CompletionFormer's PVT backbone init
  (reference completion_former_backbone.py:82-88,
  ``load_state_dict(..., strict=False)``): name-matched, missing keys keep
  their initialization.
- ``model_kwargs.resnet_pretrained`` — torchvision ResNet34 weights for
  PVT's layer1/layer2 embedding stems (reference pvt.py:13-34,249-252).

All three produce (params, state) updates merged into the freshly
initialized pytrees; conv layouts are transposed OIHW->HWIO by the importer.
"""

from __future__ import annotations

from pathlib import Path


def resolve_pretrained_path(spec, cache_dir=None) -> str:
    """Accept a local file path OR a URL for a pretrained checkpoint.

    The reference downloads EDSR weights through torch.hub when the path is
    a URL (utils/utils.py:338-349 ``load_state_dict_from_url``). Here URLs
    (http/https/file) are fetched once into ``cache_dir`` (default
    ``~/.cache/jspsr_tpu/pretrained``, override via
    ``model_kwargs.pretrained_cache``) and reused on later runs; local
    paths pass through untouched.
    """
    spec = str(spec)
    if "://" not in spec:
        return spec
    import hashlib
    import urllib.parse
    import urllib.request

    cache_dir = Path(cache_dir or
                     Path.home() / ".cache" / "jspsr_tpu" / "pretrained")
    cache_dir.mkdir(parents=True, exist_ok=True)
    name = Path(urllib.parse.urlparse(spec).path).name or "checkpoint"
    dest = cache_dir / f"{hashlib.sha256(spec.encode()).hexdigest()[:12]}_{name}"
    if not dest.exists():
        tmp = dest.with_suffix(dest.suffix + ".part")
        try:
            # socket timeout: a host that accepts the connection but never
            # sends would otherwise hang Trainer construction forever
            import shutil

            with urllib.request.urlopen(spec, timeout=60) as r, \
                    open(tmp, "wb") as f:
                shutil.copyfileobj(r, f)
        except Exception as e:
            raise FileNotFoundError(
                f"could not fetch pretrained checkpoint {spec}: {e} "
                f"(no-egress environments must place the file at {dest} "
                f"or pass a local path)") from e
        tmp.replace(dest)
    return str(dest)


def _load_torch_file(path):
    import torch

    blob = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    return blob


def apply_pretrained(p, model, params, bn_state, verbose: bool = False):
    """Apply any configured pretrained weights; returns (params, bn_state)."""
    from jspsr_tpu.utils.torch_import import (
        import_torch_state_dict,
        merge_pytree,
        pair_state_dict,
    )

    mk = p.model_kwargs

    def report(tag, skipped):
        if verbose:
            msg = f"Loaded pretrained {tag}"
            if skipped:
                msg += f" ({len(skipped)} mismatched tensors kept at init)"
            print(msg)

    pre = mk.get("pretrained")
    if pre:
        path = pre if isinstance(pre, str) else getattr(model, "url", None)
        assert path, (
            f"model_kwargs.pretrained=True but {p.model_name} has no default "
            f"pretrained path; pass the file path instead"
        )
        path = resolve_pretrained_path(path, mk.get("pretrained_cache"))
        if not Path(path).is_file():
            raise FileNotFoundError(
                f"pretrained checkpoint {path} not found (the reference "
                f"downloads from torch.hub here; this environment has no "
                f"egress — place the file locally)"
            )
        sd = pair_state_dict(model, _load_torch_file(path))
        new_p, new_s = import_torch_state_dict(model, sd, strict=False)
        params, skipped_p = merge_pytree(params, new_p)
        bn_state, skipped_s = merge_pytree(bn_state, new_s)
        report(path, skipped_p + skipped_s)

    pvt_pre = mk.get("pvt_pretrained")
    if pvt_pre:
        pvt_pre = resolve_pretrained_path(pvt_pre, mk.get("pretrained_cache"))
        former = model.backbone.former  # CompletionFormer layout
        new_p, new_s = import_torch_state_dict(
            former, _load_torch_file(pvt_pre), missing_ok=True)
        merged_p, skipped = merge_pytree(
            params["backbone"]["former"], new_p)
        params = dict(params)
        params["backbone"] = dict(params["backbone"])
        params["backbone"]["former"] = merged_p
        merged_s, skipped_s = merge_pytree(
            bn_state["backbone"]["former"], new_s)
        bn_state = dict(bn_state)
        bn_state["backbone"] = dict(bn_state["backbone"])
        bn_state["backbone"]["former"] = merged_s
        report(pvt_pre, skipped + skipped_s)

    rn_pre = mk.get("resnet_pretrained")
    if rn_pre:
        rn_pre = resolve_pretrained_path(rn_pre, mk.get("pretrained_cache"))
        sd = {k: v for k, v in _load_torch_file(rn_pre).items()}
        former = model.backbone.former
        params = dict(params)
        params["backbone"] = dict(params["backbone"])
        bn_state = dict(bn_state)
        bn_state["backbone"] = dict(bn_state["backbone"])
        for layer, attr in (("layer1", "embed_layer1"),
                            ("layer2", "embed_layer2")):
            sub_sd = {k[len(layer) + 1:]: v for k, v in sd.items()
                      if k.startswith(layer + ".")}
            mod = getattr(former, attr)
            new_p, new_s = import_torch_state_dict(mod, sub_sd,
                                                   missing_ok=True)
            merged_p, sk_p = merge_pytree(
                params["backbone"]["former"][attr], new_p)
            merged_s, sk_s = merge_pytree(
                bn_state["backbone"]["former"][attr], new_s)
            params["backbone"]["former"] = dict(
                params["backbone"]["former"])
            params["backbone"]["former"][attr] = merged_p
            bn_state["backbone"]["former"] = dict(
                bn_state["backbone"]["former"])
            bn_state["backbone"]["former"][attr] = merged_s
            report(f"{rn_pre}:{layer}", sk_p + sk_s)

    return params, bn_state
