"""Offline dataset redirect for zero-egress environments and CI smoke.

The reference solves hub-unavailability by vendoring offline dataset
builders (test/general/lm_eval/datasets/ — SURVEY §4 "offline dataset
fixtures"). The TPU framework's equivalent is one hook: every hub
`load_dataset(...)` call in the eval/calib loaders routes through
`load_dataset` below, which — when `BITDISTILLER_DATA_DIR` is set — serves
a checked-in JSONL fixture instead of the hub. The returned object is a
real `datasets.Dataset` (column access, `.shuffle(seed=)`, iteration), so
everything downstream of the load executes the production code path.

Fixture naming: `<path>__<name>__<split>.jsonl` under the data dir, with
`/` in the hub path replaced by `_` and `name=None` rendered as `default`
(e.g. `cais_mmlu__abstract_algebra__test.jsonl`,
`wikitext__wikitext-2-raw-v1__test.jsonl`). Missing fixture + data dir set
=> a clear error naming the expected file; data dir unset => the real hub
loader (unchanged behavior).

Repo fixtures live in `fixtures/` (repo root): see fixtures/README.md for
the provenance of each file.
"""

from __future__ import annotations

import json
import os

ENV_VAR = "BITDISTILLER_DATA_DIR"


def fixture_name(path: str, name: str | None, split: str | None) -> str:
    return f"{path.replace('/', '_')}__{name or 'default'}__{split}.jsonl"


def load_dataset(path: str, name: str | None = None, split: str | None = None,
                 **kwargs):
    """Drop-in for datasets.load_dataset honoring BITDISTILLER_DATA_DIR."""
    data_dir = os.environ.get(ENV_VAR)
    if not data_dir:
        import datasets

        return datasets.load_dataset(path, name, split=split, **kwargs)
    fpath = os.path.join(data_dir, fixture_name(path, name, split))
    if not os.path.exists(fpath):
        raise FileNotFoundError(
            f"{ENV_VAR}={data_dir} is set but the fixture for "
            f"load_dataset({path!r}, {name!r}, split={split!r}) is missing: "
            f"expected {fpath}"
        )
    import datasets

    with open(fpath) as f:
        rows = [json.loads(line) for line in f if line.strip()]
    return datasets.Dataset.from_list(rows)
