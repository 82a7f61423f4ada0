"""One-time converter: torchvision VGG16 + lpips v0.1 lin weights -> npz.

Run on a machine with internet access (this container has none):

    python tools/convert_lpips_weights.py --out lpips_vgg.npz

then pass the file to eval with `--lpips_weights lpips_vgg.npz`.

Sources match the reference exactly (lpipsPyTorch/modules/networks.py:100 /
modules/utils.py:11-31): VGG16_Weights.IMAGENET1K_V1 conv stack and
https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/master/
lpips/weights/v0.1/vgg.pth lin layers.
"""
from __future__ import annotations

import argparse

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_vgg.npz")
    args = ap.parse_args()

    import torch
    from torchvision import models

    vgg = models.vgg16(weights=models.VGG16_Weights.IMAGENET1K_V1).features
    out = {}
    ci = 0
    for layer in vgg:
        if isinstance(layer, torch.nn.Conv2d):
            out[f"conv{ci}_w"] = layer.weight.detach().numpy().astype(np.float32)
            out[f"conv{ci}_b"] = layer.bias.detach().numpy().astype(np.float32)
            ci += 1
    assert ci == 13, f"expected 13 convs, got {ci}"

    url = ("https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/"
           "master/lpips/weights/v0.1/vgg.pth")
    sd = torch.hub.load_state_dict_from_url(url, map_location="cpu")
    # keys: lin0.model.1.weight .. lin4.model.1.weight, shape [1, C, 1, 1]
    for i in range(5):
        key = [k for k in sd if k.startswith(f"lin{i}")][0]
        out[f"lin{i}_w"] = sd[key].detach().numpy().astype(np.float32)

    np.savez(args.out, **out)
    print(f"wrote {args.out}: {len(out)} arrays")


if __name__ == "__main__":
    main()
