"""Supervised node-classification parity row: GRevNet vs GNN on Cora."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.train_supervised import main

main(["cora"])
