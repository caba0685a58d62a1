"""protein-pca2 horizon extension, final-round sizing (verdict #1).

The 60k run is far underfit (decode density 8x sparse at the geometry-
correct T; latent probe rules out calibration) and the 400k plan
(tools/jobs/140) was round-spanning — there is no next round, so the
horizon is sized to what the remaining wall clock affords at the
measured ~23 steps/s (cap 160k total), with eval_final=0: the ~1.5 h
end-of-run selection grid + IWAE tail is skipped and the follow-up
targeted stepsweep (153) is the quotable selection instead.

Warm restart of the committed 60k checkpoint under the new-horizon
cosine schedule (st_input_norm + warmup hold stability at N=512 bf16);
in-job commits every 900 s keep the loss window <=15 min.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

TRAIN_END = 1787255100  # 19:45 UTC (retimed for the real ~22:10 round end;
                        # this job now runs BEFORE the s2 stepsweep so the
                        # queue's tail-risk lands on deep24 (verdict #2),
                        # not protein (verdict #1))
RATE = 21.0             # conservative flow steps/s at N=512 (measured ~23)

budget = max(0.0, TRAIN_END - time.time() - 300)
steps = 60000 + int(budget * RATE)
steps = min(160000, (steps // 4000) * 4000)  # align to ckpt cadence
if steps < 84000:
    print(f"[152] SKIPPED {time.strftime('%F %T')}: affordable horizon "
          f"{steps} < 84k — a <24k-step extension can't move a 60k-underfit "
          "run; leaving the 60k decode_scale resweep (job 07) as the "
          "protein row of record.", flush=True)
else:
    print(f"[152] extending protein-pca2 60k -> {steps}", flush=True)
    from scripts.train_gnf import main

    main([
        "protein-pca",
        "name=protein-pca2",
        "ae_from=protein-pca",
        "ae.decoder_c=100.0",
        "flow.st_input_norm=True",
        "train.lr_warmup=2000",
        f"train.num_steps={steps}",
        "train.git_commit_s=900",
        "eval_final=0",
        "resume=1",
    ])
