#!/usr/bin/env python3
"""Bring-your-own-model, step 1: export a public score/caption head to
the graft interpreter's op subset.

The engine runs real `.onnx` graphs on its in-repo interpreter
(graft.onnx.OnnxModel — see OnnxModel.SupportedOps for the subset);
what does NOT ship is trained weights. This script is the documented
recipe for turning a public torch checkpoint (an aesthetic/NSFW-class
MLP over CLIP embeddings, or a small conv score head) into a file the
filters accept via `OnnxScoreFilter(modelPath = ...)` et al.

Run it WHERE TORCH IS INSTALLED (the build container has no torch and
no egress — this is a user-side tool, like downloading the weights
themselves). Then gate the artifact in-container, step 2:

    java -cp target/scala-2.13/classes:/opt/spark/jars/* \
        graft.ModelCheck model.onnx 64x3x224x224

which prints the COMPLETE unsupported-op census (exit 1 if any) and a
measured ms/image. Step 3: point the filter at the file — model load
is cached once per executor (OnnxModel.forPath).

Export rules that keep a head inside the subset:
  * model.eval() first — Dropout/BatchNorm must fold to inference
    form (the interpreter treats Dropout as identity and BN as the
    eval-mode affine).
  * opset_version=17, dynamo=False (the classic exporter's op
    choices match the subset; dynamo emits aten-style decomposed
    graphs with ops like ScatterND).
  * fixed input size, no dynamic_axes — the filters batch to a fixed
    [N, ...] themselves and ModelCheck times a concrete shape.
  * avoid exotic pooling/resize inside the model; pre-size inputs on
    the Spark side (Resizer/ImageResizeTransforms do this already).
  * GRU-bearing flow nets export forward-direction, default
    activations (the interpreter's GRU tier).

Typical usage for the reference's improved-aesthetic head (an MLP over
CLIP ViT-L/14 embeddings — DPF aesthetic_improved_filter downloads
these weights at runtime):

    python tools/export_model.py --mlp 768 --weights sac_logos_ava1.pth \
        --out aesthetic.onnx
"""
import argparse


def export_mlp(dim, weights, out):
    import torch  # user-side dependency, by design

    class Head(torch.nn.Module):
        """The public improved-aesthetic head layout: 768 → 1024 →
        128 → 64 → 16 → 1 with dropout between (identity at eval)."""

        def __init__(self, d):
            super().__init__()
            self.layers = torch.nn.Sequential(
                torch.nn.Linear(d, 1024), torch.nn.Dropout(0.2),
                torch.nn.Linear(1024, 128), torch.nn.Dropout(0.2),
                torch.nn.Linear(128, 64), torch.nn.Dropout(0.1),
                torch.nn.Linear(64, 16),
                torch.nn.Linear(16, 1))

        def forward(self, x):
            return self.layers(x)

    m = Head(dim)
    m.load_state_dict(torch.load(weights, map_location="cpu"))
    m.eval()
    torch.onnx.export(
        m, torch.zeros(1, dim), out,
        opset_version=17, dynamo=False,
        input_names=["x"], output_names=["score"])
    print(f"wrote {out}; now run graft.ModelCheck {out} 64x{dim}")


def export_conv(weights, size, out):
    import torch
    m = torch.load(weights, map_location="cpu")  # a full nn.Module
    m.eval()
    torch.onnx.export(
        m, torch.zeros(1, 3, size, size), out,
        opset_version=17, dynamo=False,
        input_names=["x"], output_names=["score"])
    print(f"wrote {out}; now run graft.ModelCheck {out} 64x3x{size}x{size}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mlp", type=int, metavar="DIM",
                    help="export an embedding-MLP head (e.g. 768)")
    ap.add_argument("--conv", type=int, metavar="SIZE",
                    help="export a conv score head at SIZE x SIZE")
    ap.add_argument("--weights", required=True)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    if a.mlp:
        export_mlp(a.mlp, a.weights, a.out)
    elif a.conv:
        export_conv(a.weights, a.conv, a.out)
    else:
        ap.error("pick --mlp DIM or --conv SIZE")
