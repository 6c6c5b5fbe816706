#!/usr/bin/env python3
"""Append-merge an eval_matrix summary.txt into an archived one.

After a container wipe, runs/<eval_dir>/summary.txt holds only the cells
evaluated in the fresh run; a plain `cp` over the archive in results/
silently deletes every previously archived row (observed 2026-08-19 with
lane C's s2 cell). This merges instead: rows whose (model, condition,
family) key is new are appended; existing keys are left untouched.

Usage: python scripts/merge_summary.py <fresh_summary> <archived_summary>
"""
import sys


def main() -> None:
    fresh, archived = sys.argv[1], sys.argv[2]
    try:
        old_lines = open(archived).read().splitlines()
    except FileNotFoundError:
        old_lines = []
    keys = {
        tuple(l.split()[:3])
        for l in old_lines
        if l.strip() and not l.startswith(("#", "|", "-"))
    }
    add = [
        l
        for l in open(fresh).read().splitlines()
        if l.strip()
        and not l.startswith(("#", "|", "-"))
        and len(l.split()) >= 3
        and tuple(l.split()[:3]) not in keys
    ]
    if add:
        with open(archived, "a") as f:
            f.write("\n".join(add) + "\n")
    print(f"merge_summary: {archived} += {len(add)} rows from {fresh}")


if __name__ == "__main__":
    main()
