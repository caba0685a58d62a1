"""Monte-Carlo error bars for the ego-small-pca sweep winner (5 sampling
seeds x 256 samples at the train-selected decode)."""
import json
import sys

sys.path.insert(0, "/root/repo")
with open("runs/ego-small-pca/stepsweep.json") as f:
    rows = json.load(f)
pool = [r for r in rows if "train_score_refined" in r
        or "train_conn_penalty" in r]
pick = min(pool or rows,
           key=lambda r: r.get("train_score_refined", r["train_score"]))
from scripts.eval_ci import main as eval_ci

eval_ci([
    "ego-small-pca",
    "seeds=5",
    "num_samples=256",
    f"step={pick['step']}",
    f"variant={pick.get('variant', 'raw')}",
    f"temperature={pick['temp']}",
    f"threshold={pick['threshold']}",
    f"connect_isolated={int(pick.get('connect_isolated', False))}",
    f"edge_sample={int(pick.get('edge_sample', False))}",
    f"connect_components={int(pick.get('connect_components', False))}",
])
