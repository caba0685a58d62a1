"""protein-pca2: stabilized flow retrain after protein-pca's flow NaN'd at
step ~25.2k (lr 7e-4 post-warmup, bf16, N=512 attention; grad_norm was 0.76
at the last good log — a between-logs spike, the round-5 deep-stack
signature). flow.st_input_norm=True cuts the attention-logit growth loop at
its root (proved at depth 24 in round 3) and is parameter-free; warmup 2000
is cheap insurance on the fresh flow start. Reuses the finished committed
AE (15k steps, ckpt_ae) via ae_from — stage 2 only."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_gnf import main

main([
    "protein-pca",
    "name=protein-pca2",
    "ae_from=protein-pca",
    "ae.decoder_c=100.0",  # the source AE's sweep-winner config (job 110)
    "flow.st_input_norm=True",
    "train.lr_warmup=2000",
    "train.git_commit_s=900",
    "resume=1",
])
