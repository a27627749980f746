"""CLI: generate a synthetic Unsloth-format NF4 checkpoint (random weights).

Stands in for the HF download of ``unsloth/gpt-oss-20b-unsloth-bnb-4bit`` in
this egress-free environment; produces the exact key schema the converter and
loader consume (see ``checkpoint.unsloth``).
"""

from __future__ import annotations

import argparse

from gpt_oss_vllm_tpu.config import ModelConfig
from gpt_oss_vllm_tpu.checkpoint.unsloth import write_synthetic_unsloth_checkpoint


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--layers", type=int, default=None, help="override num_layers")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--files", type=int, default=2)
    ap.add_argument("--nibble-order", default="low_first", choices=["low_first", "high_first"])
    ap.add_argument("--offset", action="store_true", help="include double-quant offset keys")
    ap.add_argument("--format", default="unsloth", choices=["unsloth", "gpt-oss-mxfp4"])
    args = ap.parse_args(argv)

    cfg = ModelConfig.tiny() if args.tiny else ModelConfig()
    if args.layers is not None:
        import dataclasses

        cfg = dataclasses.replace(cfg, num_layers=args.layers)
    if args.format == "gpt-oss-mxfp4":
        from gpt_oss_vllm_tpu.checkpoint.gpt_oss_mxfp4 import write_synthetic_gpt_oss_mxfp4

        paths = write_synthetic_gpt_oss_mxfp4(
            args.out, cfg, seed=args.seed, num_files=args.files,
            nibble_order=args.nibble_order,
        )
    else:
        paths = write_synthetic_unsloth_checkpoint(
            args.out,
            cfg,
            seed=args.seed,
            num_files=args.files,
            nibble_order=args.nibble_order,
            use_offset=args.offset,
        )
    print(f"wrote {len(paths)} safetensors files to {args.out}")


if __name__ == "__main__":
    main()
