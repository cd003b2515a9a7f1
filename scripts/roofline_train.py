"""Analytic roofline for the detector train step (VERDICT r2 #5).

Walks the trunk+head graph IR and derives, per op class, the per-step floor
time = max(HBM bytes / BW, MXU FLOPs / peak) for the bf16 b128 train step,
then compares against the measured xplane breakdown (PROFILE.md train
section: 77.9 ms conv fusions, 53.3 ms wgrad+Adam, 45.9 ms BN-grad
reductions at b128 → 180 ms device, 709 img/s with the VMEM budget).

Byte-accounting model (bf16 activations, f32 master params; B = batch):
  fwd conv    : read x, write y (BN+leaky fused into the conv epilogue; the
                one-pass E[x²]−E[x]² stats ride the same write pass)
  dgrad conv  : read dy, write dx (weights are noise at these sizes)
  wgrad conv  : read x again, read dy again, write dW (f32)
  BN grad     : read dy and x̂ (the saved normalized activation) once more —
                Σdy / Σdy·x̂ sibling reductions + dx elementwise
Weights/optimizer traffic: 62M params × (read W bf16 + read/write m,v,W f32)
per step, amortized over the whole step.

FLOPs: 2·K²·Cin·Cout·H·W·B each for fwd/dgrad/wgrad (dgrad/wgrad of a
stride-2 conv cost the same MACs as fwd).

Peaks (v5e public figures): 197 TFLOP/s bf16, 819 GB/s HBM. The conclusion
this script prints — what fraction of the measured step sits above the
floor — is written up in PROFILE.md.

Usage: python scripts/roofline_train.py [batch]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from face_vijnana_yolov3_tpu.models import darknet

PEAK_FLOPS = 197e12   # bf16 MXU, one v5e chip
PEAK_BW = 819e9       # HBM GB/s
A_BYTES = 2           # bf16 activations
W_BYTES = 4           # f32 master params / Adam moments / wgrads


def conv_shapes(ops, image_size=416):
    """Yield (idx, k, cin, cout, h_out, w_out, stride) for each conv."""
    h = image_size
    cin = 3
    for op in ops:
        if op[0] != "conv":
            continue
        _, idx, cout, k, stride, bn, leaky = op
        h_out = h // stride
        yield idx, k, cin, cout, h_out, stride, bn
        h, cin = h_out, cout


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    ops = darknet.trunk_graph() + [("conv", "head", 6, 3, 1, False, False)]

    def pad(x, g):
        return -(-x // g) * g

    tot = {"fwd": [0, 0], "dgrad": [0, 0], "wgrad": [0, 0], "bngrad": [0, 0]}
    pad_tot = {"fwd": 0, "dgrad": 0, "wgrad": 0}
    n_params = 0
    for idx, k, cin, cout, h, stride, bn in conv_shapes(ops):
        hw_out = h * h
        hw_in = (h * stride) ** 2
        macs = 2 * k * k * cin * cout * hw_out * batch
        # MXU-tiling-effective MACs: the systolic array contracts over
        # 128-lane tiles and emits 128-wide outputs; narrow dims (conv_0's
        # k²·cin = 27 contraction, cout = 32) occupy full tiles regardless.
        # fwd/wgrad contract over k²·cin (out cout); dgrad contracts over
        # k²·cout (out cin).
        pad_tot["fwd"] += 2 * pad(k * k * cin, 128) * pad(cout, 128) \
            * hw_out * batch
        pad_tot["dgrad"] += 2 * pad(k * k * cout, 128) * pad(cin, 128) \
            * hw_in * batch
        # wgrad contracts over B·H·W (huge, no padding waste); outputs
        # k²·cin × cout tiles.
        pad_tot["wgrad"] += 2 * pad(k * k * cin, 8) * pad(cout, 128) \
            * hw_out * batch
        x_b = hw_in * cin * batch * A_BYTES      # input activation bytes
        y_b = hw_out * cout * batch * A_BYTES    # output activation bytes
        w_b = k * k * cin * cout * W_BYTES
        n_params += k * k * cin * cout + (4 * cout if bn else cout)

        tot["fwd"][0] += macs
        tot["fwd"][1] += x_b + y_b
        tot["dgrad"][0] += macs
        tot["dgrad"][1] += y_b + x_b            # read dy, write dx
        tot["wgrad"][0] += macs
        tot["wgrad"][1] += x_b + y_b + w_b      # re-read x and dy, write dW
        if bn:
            # sibling Σdy/Σdy·x̂ + elementwise dx: one more read of dy and x̂
            tot["bngrad"][1] += 2 * y_b

    # Optimizer/param traffic per step (Adam: read W,m,v f32 + write all
    # three + the bf16 compute copy of W read by fwd/dgrad).
    opt_bytes = n_params * (6 * W_BYTES + 2 * A_BYTES)

    print(f"batch {batch}; params {n_params / 1e6:.1f}M")
    print(f"{'class':>8} {'TFLOP':>7} {'padTF':>7} {'GB':>7} {'t_flop':>8} "
          f"{'t_pad':>8} {'t_bw':>8} {'floor':>8}")
    floor_ms = 0.0
    for name, (flops, bbytes) in tot.items():
        pflops = pad_tot.get(name, 0)
        t_f = flops / PEAK_FLOPS * 1e3
        t_p = pflops / PEAK_FLOPS * 1e3
        t_b = bbytes / PEAK_BW * 1e3
        fl = max(t_p, t_b)
        floor_ms += fl
        print(f"{name:>8} {flops / 1e12:>7.2f} {pflops / 1e12:>7.2f} "
              f"{bbytes / 1e9:>7.2f} {t_f:>7.1f}ms {t_p:>7.1f}ms "
              f"{t_b:>7.1f}ms {fl:>7.1f}ms")
    t_opt = opt_bytes / PEAK_BW * 1e3
    floor_ms += t_opt
    print(f"{'adam':>8} {'-':>7} {opt_bytes / 1e9:>7.2f} {'-':>8} "
          f"{t_opt:>7.1f}ms {t_opt:>7.1f}ms")
    print(f"\nstep floor = {floor_ms:.1f} ms  ->  "
          f"{batch / floor_ms * 1e3:.0f} img/s ideal")
    for meas in (180.0, 186.0):
        print(f"measured {meas:.0f} ms device -> floor/measured = "
              f"{floor_ms / meas * 100:.0f}% "
              f"({batch / meas * 1e3:.0f} img/s)")


if __name__ == "__main__":
    main()
