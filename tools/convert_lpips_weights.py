"""One-time converter: torchvision VGG16 + lpips v0.1 lin weights -> npz.

Run on a machine with internet access (this container has none):

    python tools/convert_lpips_weights.py --out lpips_vgg.npz

then pass the file to eval with `--lpips_weights lpips_vgg.npz`.

Sources match the reference exactly (lpipsPyTorch/modules/networks.py:100 /
modules/utils.py:11-31): VGG16_Weights.IMAGENET1K_V1 conv stack and
https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/master/
lpips/weights/v0.1/vgg.pth lin layers.

The extraction itself is `extract_lpips_arrays` — a pure function of a
torch module in the torchvision `.features` layout plus the lin state
dict, so it is covered offline by tests/test_lpips.py with random weights;
`main()` only supplies the pretrained inputs.
"""
from __future__ import annotations

import argparse

import numpy as np


def extract_lpips_arrays(features, lin_state_dict) -> dict:
    """torch `.features` Sequential (13 convs in torchvision vgg16 order) +
    lpips v0.1 lin state dict (`lin{i}...weight` keys, [1,C,1,1]) -> the
    flat float32 array dict that `np.savez`/`load_lpips_params` use."""
    import torch

    out = {}
    ci = 0
    for layer in features:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{ci}_w"] = layer.weight.detach().numpy().astype(np.float32)
            out[f"conv{ci}_b"] = layer.bias.detach().numpy().astype(np.float32)
            ci += 1
    if ci != 13:
        raise ValueError(f"expected 13 convs, got {ci}")

    for i in range(5):
        keys = [k for k in lin_state_dict if k.startswith(f"lin{i}")]
        if not keys:
            raise ValueError(f"lin{i} weight missing from state dict")
        out[f"lin{i}_w"] = (
            lin_state_dict[keys[0]].detach().numpy().astype(np.float32)
        )
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    from torchvision import models

    vgg = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).features
    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           "master/lpips/weights/v0.1/vgg.pth")
    sd = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    out = extract_lpips_arrays(vgg, sd)
    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
