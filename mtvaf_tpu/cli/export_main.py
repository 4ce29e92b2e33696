"""``mtvaf-export`` — freeze a training run into a serving bundle.

Loads the run's predictor (run_config.json + best_model.npz, see
``infer.load_predictor``) and writes self-contained StableHLO artifacts
with the weights baked in (``export.export_predictor``): one program per
(stage, batch rung) plus manifest.json.  Serve the bundle anywhere jax
runs — no framework model code, no weights file, no Python-side drift:

  mtvaf-export --save_path out/ --out bundle/ --batch_sizes 1,16
  >>> from mtvaf_tpu.export import load_exported_predictor
  >>> load_exported_predictor("bundle/", tokenizer).predict([...])
"""

from __future__ import annotations

import argparse
import logging

logger = logging.getLogger(__name__)


def main(argv=None):
    logging.basicConfig(level=logging.INFO)
    p = argparse.ArgumentParser("mtvaf-export")
    p.add_argument("--save_path", required=True,
                   help="training run directory (run_config.json + "
                        "best_model.npz)")
    p.add_argument("--out", required=True, help="bundle output directory")
    p.add_argument("--batch_sizes", default="1,16",
                   help="comma-separated compiled batch rungs")
    p.add_argument("--platforms", default="cpu,tpu",
                   help="lowering targets baked into the artifact "
                        "(comma-separated; a Pallas-attention predictor "
                        "is tpu-only)")
    p.add_argument("--bert_name", default=None,
                   help="override the run's tokenizer directory")
    p.add_argument("--bake_weights", action="store_true",
                   help="bake the weights into every rung's program "
                        "(fully self-contained artifacts, ~param bytes "
                        "PER RUNG; remote-compile backends may cap the "
                        "request size).  Default: weights.npz stored once "
                        "per bundle, programs stay ~KB")
    args = p.parse_args(argv)

    from ..export import export_predictor
    from ..infer import load_predictor

    logger.info("loading predictor from %s", args.save_path)
    predictor = load_predictor(args.save_path, bert_name=args.bert_name)
    manifest = export_predictor(
        predictor, args.out,
        batch_sizes=[int(b) for b in args.batch_sizes.split(",")],
        platforms=[s.strip() for s in args.platforms.split(",")],
        bake_weights=args.bake_weights)
    total = sum(prog["bytes"] for prog in manifest["programs"])
    logger.info("wrote %d programs (%.1f MB) to %s",
                len(manifest["programs"]), total / 1e6, args.out)


if __name__ == "__main__":
    main()
