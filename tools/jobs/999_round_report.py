"""Aggregate all run artifacts into the round results table (CPU-only)."""
import sys

sys.path.insert(0, "/root/repo")
from scripts.round_report import main

main([])
