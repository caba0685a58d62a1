"""Attribute the community-small connectivity gap (decode- vs flow-side)
on the seed-selected winner — see scripts/connectivity_probe.py."""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
from scripts.connectivity_probe import main

run = "community-small-pca"
if os.path.exists("runs/seed_select.json"):
    with open("runs/seed_select.json") as f:
        run = json.load(f)["selected"]["run"]
main([run, "num_samples=256"])
