#!/usr/bin/env python3
"""Embed the real UCI datasets available offline (sklearn's bundled
copies) into datasets/pmlb_cache/ as PMLB-style TSVs.

Context (r05, VERDICT r04 missing #1): the reference proves SGD
certificates over real PMLB datasets fetched at runtime
(sgdcodegen.py:30).  This environment has zero network egress, no pmlb
package, and no cached copies of the 17 named PMLB sets anywhere on disk
(searched: pip caches, R libraries, nltk_data, /usr/share).  The real
data that EXISTS offline is sklearn's bundled UCI corpus: iris and wine
(already embedded) plus breast_cancer and digits — embedded here and
proved as an extra-suite real-data demonstration
(scripts/prove_sgd_real_extra.py).
"""

import os

import numpy as np
from sklearn import datasets as skd

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "datasets", "pmlb_cache")


def write_tsv(name: str, X, y, feat_names=None):
    d = os.path.join(ROOT, name)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, name + ".tsv")
    n, k = X.shape
    if feat_names is None:
        feat_names = [f"f{i}" for i in range(k)]
    cols = [str(fn).replace(" ", "_").replace("(", "").replace(")", "") for fn in feat_names]
    with open(path, "w") as f:
        f.write("\t".join(cols + ["target"]) + "\n")
        for i in range(n):
            row = ["%g" % v for v in X[i]] + [str(int(y[i]))]
            f.write("\t".join(row) + "\n")
    print(f"wrote {path}: {n}x{k}")


def main():
    bc = skd.load_breast_cancer()
    write_tsv("breast_cancer_wisconsin", bc.data, bc.target, bc.feature_names)

    dg = skd.load_digits()
    write_tsv("optdigits", dg.data, dg.target)


if __name__ == "__main__":
    main()
