"""Export a TPU-fine-tuned vocoder back to the official torch format.

Takes a ``Vocoder_*`` checkpoint written by scripts/train_vocoder.py
(or any of our generator param pytrees) and writes a ``g_*``-style
torch blob ({"generator": state_dict} with weight_g/weight_v keys)
that loads into the upstream PyTorch HiFi-GAN ``Generator`` unchanged,
so fine-tuned vocoders can flow back to GPU serving stacks.

Usage:
    python tools/export_vocoder_torch.py \
        trainings/my_exp/vocoder_checkpoints/Vocoder_100000 g_00100000
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint",
                        help="Vocoder_* checkpoint directory")
    parser.add_argument("output", help="output torch file (g_*)")
    args = parser.parse_args()

    import torch

    from daft_exprt_tpu.vocoder.hifigan import (export_torch_state_dict,
                                                load_generator)

    gen, params = load_generator(args.checkpoint)
    blob = export_torch_state_dict(gen, params)
    torch.save(blob, args.output)
    cfg_path = args.output + ".config.json"
    with open(cfg_path, "w") as f:
        json.dump(gen.cfg, f, indent=2)
    n = sum(int(v.numel()) for v in blob["generator"].values())
    print(f"wrote {args.output} ({n:,} params) + {cfg_path}")


if __name__ == "__main__":
    main()
