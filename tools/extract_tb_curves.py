"""Extract training-run scalar curves from a TensorBoard event dir into a
compact JSON committed next to the run summary (docs/TRAINING_RUN.md) —
event files are gitignored with the rest of logs/, the curves are not.

Usage: python tools/extract_tb_curves.py <tb_dir> <out.json>
"""
import json
import sys


def main():
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)

    tb_dir, out_path = sys.argv[1], sys.argv[2]
    ea = EventAccumulator(tb_dir, size_guidance={"scalars": 0})
    ea.Reload()
    curves = {}
    for tag in sorted(ea.Tags()["scalars"]):
        ev = ea.Scalars(tag)
        curves[tag] = {"steps": [e.step for e in ev],
                       "values": [round(float(e.value), 6) for e in ev]}
    with open(out_path, "w") as f:
        json.dump(curves, f)
    print(f"{len(curves)} tags -> {out_path}")


if __name__ == "__main__":
    main()
