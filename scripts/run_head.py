"""Per-head train -> checkpoint -> eval -> predict lifecycle, Spark-first.

The equivalent of the reference's run scripts (run_baseline.py /
run_mpn.py / run_mhs.py / run_mhs_biaffine.py): train the head's output
layers with distributed data-parallel SGD, keep the best epoch, save the
weights checkpoint (npz — the torch.save analogue), run distributed
extraction WITH the trained weights, write reference-format prediction
JSONL, and score predictions against gold with the DuIE exact-match
metric.

    python scripts/run_head.py --head mpn --synthetic 400 --epochs 3 \
        --workdir /tmp/head_run
    python scripts/run_head.py --head bio --train-jsonl data/train.json \
        --workdir /tmp/head_run

Cluster launch: package the library (zip) and ship the checkpoint to
executors with ``spark-submit --py-files nre_spark.zip --files
weights.npz`` (resolve it worker-side via SparkFiles.get).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description="per-head training lifecycle")
    ap.add_argument("--head", default="mpn",
                    choices=["bio", "mpn", "mhs", "biaffine"])
    ap.add_argument("--synthetic", type=int, default=0,
                    help="generate N synthetic turns instead of --train-jsonl")
    ap.add_argument("--train-jsonl",
                    help="DuIE-style {text, spo_list} JSONL training file")
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--early-stop", type=int, default=None,
                    help="stop after N consecutive non-improving epochs "
                         "(reference finetuning_argparse.py --early_stop)")
    ap.add_argument("--lr", type=float, default=None)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--master", default=None)
    args = ap.parse_args()
    if not args.synthetic and not args.train_jsonl:
        ap.error("need --synthetic or --train-jsonl")

    from nlp_series_relation_extraction_spark.core.encoders import (
        encoder_with_weights,
        save_encoder,
    )
    from nlp_series_relation_extraction_spark.evaluation.metrics import triple_prf
    from nlp_series_relation_extraction_spark.operators.extract import (
        extract_turn_results,
        extract_triples,
    )
    from nlp_series_relation_extraction_spark.operators.train import (
        train_bio_head,
        train_mhs_head,
        train_mpn_head,
    )
    from nlp_series_relation_extraction_spark.session import get_spark
    from nlp_series_relation_extraction_spark.sources.io import (
        read_duie_jsonl,
        write_prediction_jsonl_reference_format,
    )
    from nlp_series_relation_extraction_spark.sources.synthetic import (
        gold_triples,
        synth_transcripts,
    )

    os.makedirs(args.workdir, exist_ok=True)
    spark = get_spark(app_name=f"train-{args.head}", master=args.master)
    spark.sparkContext.setLogLevel("WARN")

    if args.synthetic:
        data = synth_transcripts(spark, args.synthetic, seed=args.seed)
    else:
        data = read_duie_jsonl(spark, args.train_jsonl)
    data = data.localCheckpoint(eager=True)

    # --- train (output layers over the frozen trunk; best epoch kept) -----
    if args.head == "bio":
        res = train_bio_head(
            data, epochs=args.epochs, lr=args.lr or 0.08, seed=args.seed,
            early_stop=args.early_stop,
        )
        trained = {"w_bio": res["weights"]}
    elif args.head == "mpn":
        res = train_mpn_head(
            data, epochs=args.epochs, lr=args.lr or 0.4, seed=args.seed,
            early_stop=args.early_stop,
        )
        trained = {"w_sub": res["w_sub"], "w_po": res["w_po"]}
    else:
        res = train_mhs_head(
            data, epochs=args.epochs, lr=args.lr or 0.2, seed=args.seed,
            biaffine=(args.head == "biaffine"),
            early_stop=args.early_stop,
        )
        trained = dict(res["weights"])

    # --- checkpoint (torch.save analogue) ---------------------------------
    weights_path = os.path.join(args.workdir, f"{args.head}_weights.npz")
    save_encoder(encoder_with_weights(args.seed, **trained), weights_path)

    # --- distributed eval/predict with the trained weights ----------------
    pred_dir = os.path.join(args.workdir, "predictions")
    turns = extract_turn_results(
        data, head=args.head, seed=args.seed, weights_path=weights_path,
        keep_text=True,
    ).localCheckpoint(eager=True)
    write_prediction_jsonl_reference_format(turns, pred_dir)
    pred = extract_triples(
        data, head=args.head, seed=args.seed, weights_path=weights_path
    )
    ev = triple_prf(pred, gold_triples(spark, data)).collect()[0]

    print(json.dumps({
        "head": args.head,
        "epochs": args.epochs,
        "loss_history": [round(float(x), 6) for x in res["loss_history"]],
        "loss_sliding20": [round(float(x), 6) for x in res["loss_sliding20"]],
        "best_loss": round(float(res["best_loss"]), 6),
        "weights": weights_path,
        "predictions": pred_dir,
        "eval": {
            "tp": ev.tp, "fp": ev.fp, "fn": ev.fn,
            "precision": round(ev.precision, 6),
            "recall": round(ev.recall, 6),
            "f1": round(ev.f1, 6),
        },
    }))
    spark.stop()


if __name__ == "__main__":
    main()
