"""SO(3)-trained classification regime (VERDICT r4 #3, class half).

r4's table covered I-trained equivariant + standard (PARITY.md); this
adds the SO(3)-TRAINED row for both models on the same synthetic shape
set: rotation-augmented training (``MN40_DS_Aug`` — the reference's own
free-3D-rotation train augs) evaluated unrotated and under SO(3).
Expected shape (reference README regime table): SO(3) training restores
the standard net's rotated accuracy at some unrotated cost, while the
equivariant net's numbers stay regime-independent.

Usage: python experiments/regimes_class.py --out /tmp/mn40_regimes \
           [--epochs 60] [--votes 30]
"""
import argparse
import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = [
    ("equiv_SO3", "ClassNetRotEquivMLPGELU19Former", True),
    ("standard_SO3", "ClassNetMLPGELU19Former", False),
]


def sh(cmd, timeout, log):
    print(f"$ {' '.join(cmd)}", flush=True)
    t0 = time.time()
    p = subprocess.run(
        cmd, cwd=ROOT, timeout=timeout, capture_output=True, text=True
    )
    out = p.stdout + p.stderr
    with open(log, "a") as f:
        f.write(f"\n$ {' '.join(cmd)} (rc={p.returncode}, {time.time()-t0:.0f}s)\n")
        f.write(out[-8000:])
    print(f"  rc={p.returncode} {time.time()-t0:.0f}s", flush=True)
    return p.returncode, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--votes", type=int, default=30)
    ap.add_argument("--points", type=int, default=4096)
    ap.add_argument("--batch", type=int, default=12)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    log = os.path.join(args.out, "driver.log")
    results_path = os.path.join(args.out, "regimes_class.json")
    results = (
        json.load(open(results_path)) if os.path.exists(results_path) else {}
    )

    if not os.path.exists(os.path.join(args.out, "scale_mn40.yaml")):
        rc, _ = sh(
            [sys.executable, "experiments/synthetic_shapes.py",
             "--out", args.out, "--epochs", str(args.epochs),
             "--points", str(args.points), "--batch", str(args.batch)],
            600, log,
        )
        assert rc == 0

    base = open(os.path.join(args.out, "scale_mn40.yaml")).read()
    only = set(args.only.split(",")) if args.only else None
    for name, model, equivariant in RUNS:
        if only and name not in only:
            continue
        conf_text = base.replace(
            "MN40_no_rot_DS_Aug", "MN40_DS_Aug"  # SO(3) training regime
        ).replace(
            "ClassNetRotEquivMLPGELU19Former", model
        ).replace(
            f"log_folder: '{args.out}/logs'",
            f"log_folder: '{args.out}/logs_{name}'",
        )
        if not equivariant:
            # standard net: strip the RefFrames block
            conf_text = re.sub(r"    RefFrames:\n(        .*\n?)*", "", conf_text)
        conf = os.path.join(args.out, f"{name}.yaml")
        open(conf, "w").write(conf_text)
        results.setdefault(name, {})
        if not results[name].get("trained"):
            rc, _ = sh(
                [sys.executable, "tasks/train.py", "--conf_file", conf,
                 "--data_folder", args.out],
                10800, log,
            )
            if rc != 0:
                print(f"TRAIN FAILED {name}")
                continue
            results[name]["trained"] = True
            json.dump(results, open(results_path, "w"), indent=1)
        for label, eval_aug in [("I", "MN40_DS_Aug_test"),
                                ("SO3", "MN40_DS_Aug_test_rot3D")]:
            if label in results[name]:
                continue
            # eval conf = this run's conf (right model for the ckpt) with
            # the regime's eval augs swapped in
            econf_text = conf_text.replace(
                "test_aug_file: 'configs.modelnet40.MN40_DS_Aug_test'",
                f"test_aug_file: 'configs.modelnet40.{eval_aug}'",
            )
            econf = os.path.join(args.out, f"{name}_eval_{label}.yaml")
            open(econf, "w").write(econf_text)
            rc, out = sh(
                [sys.executable, "tasks/test_class.py",
                 "--conf_file", econf,
                 "--log_folder", os.path.join(args.out, f"logs_{name}"),
                 "--data_folder", args.out,
                 "--vote_epochs", str(args.votes)],
                7200, log,
            )
            m = re.findall(r"^Acc: ([0-9.]+)", out, re.M)
            acc = float(m[-1]) if m else None
            print(f"{name} eval {label}: acc {acc}", flush=True)
            results[name][label] = acc
            json.dump(results, open(results_path, "w"), indent=1)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
