"""Compile the ablate_step train step and dump optimized HLO to /tmp.

Usage: python scripts/dump_hlo.py [ablation] [out.txt]
"""
import sys

sys.path.insert(0, "/root/repo")


def main():
    ablation = sys.argv[1] if len(sys.argv) > 1 else "noprop"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/snt_hlo.txt"
    from scripts.ablate_step import build

    train_props = not ablation.startswith("np_") and ablation != "noprop"
    step_fn, state, make_batch = build(ablation)
    b = make_batch(0)
    compiled = step_fn.lower(state, *b, train_props).compile()
    txt = compiled.as_text()
    with open(out, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt)} bytes to {out}")


if __name__ == "__main__":
    main()
