"""Column-pruned lake reads (read_lake/final_state ``columns=``): a
two-column consumer must not pull the text payload off storage, across
every layout (plain, chunked, MoR, schema-evolved, cell kernel) — and the
pruned result must equal the full read projected."""

import os
from pathlib import Path

import pandas as pd
import pytest

from migration_pair_ray.changegen import generate_change_log
from migration_pair_ray.config import JobConfig
from migration_pair_ray.pipelines.replay import final_state, read_lake, replay


def _lake(tmp_path, name, **cfg_kw):
    stage = tmp_path / f"stage_{name}"
    # tool_epoch=1 → the first file predates the tool column (evolution)
    files = generate_change_log(str(stage), n_events=1500, n_convs=10,
                                n_files=3, tool_epoch=1, seed=13)
    log = tmp_path / f"log_{name}"
    log.mkdir()
    cfg = JobConfig(changelog_dir=str(log),
                    lake_dir=str(tmp_path / f"lake_{name}"),
                    num_partitions=4, hash_state=False, **cfg_kw)
    for f in files:
        os.link(f, log / Path(f).name)
    replay(cfg)
    return cfg


def _df(ds) -> pd.DataFrame:
    return (ds.to_pandas().sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True))


CASES = [
    {},                                               # plain single-file
    {"state_chunk_rows": 64},                         # chunked layout
    {"mor_max_deltas": 8},                            # merge-on-read
    {"merge_kernel": "cell"},                         # cell kernel
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("cfg_kw", CASES,
                         ids=["plain", "chunked", "mor", "cell"])
def test_pruned_final_state_equals_projection(tmp_path, cfg_kw):
    cfg = _lake(tmp_path, "p", **cfg_kw)
    cols = ["conv_id", "turn_idx", "tool"]   # tool absent from file 0
    full = _df(final_state(cfg, sort=False))[cols]
    pruned = _df(final_state(cfg, sort=False, columns=cols))
    assert list(pruned.columns) == cols
    pd.testing.assert_frame_equal(pruned, full, check_dtype=False)


@pytest.mark.usefixtures("ray_session")
def test_pruned_read_lake_and_validation(tmp_path):
    cfg = _lake(tmp_path, "v")
    # read_lake keeps internal rows: op is requestable there
    t = read_lake(cfg, columns=["conv_id", "op"]).to_pandas()
    assert list(t.columns) == ["conv_id", "op"]
    assert set(t["op"].unique()) <= {"I", "U", "D"}
    full = read_lake(cfg).to_pandas()
    assert len(t) == len(full)               # tombstones included both ways

    with pytest.raises(ValueError, match="not in the lake schema"):
        read_lake(cfg, columns=["nope"]).to_pandas()
    with pytest.raises(ValueError, match="cannot request"):
        final_state(cfg, columns=["conv_id", "op"])
    with pytest.raises(ValueError, match="needs conv_id"):
        final_state(cfg, sort=True, columns=["role"])


@pytest.mark.usefixtures("ray_session")
def test_pruned_read_skips_text_bytes(tmp_path):
    """The pruned plan must actually read less: compare the Ray Data
    stats' read output bytes with and without pruning."""
    cfg = _lake(tmp_path, "b")
    import re

    def read_bytes(ds) -> int:
        ds = ds.materialize()
        stats = ds.stats()
        # first operator = the Parquet read; its "Output size bytes per
        # block: ... N total" is what left storage
        read_block = stats.split("Operator 2")[0]
        m = re.search(r"Output size bytes per block:.*?(\d+) total",
                      read_block)
        assert m, read_block
        return int(m.group(1))

    full = read_bytes(final_state(cfg, sort=False))
    slim = read_bytes(final_state(cfg, sort=False,
                                  columns=["conv_id", "turn_idx"]))
    assert slim < full * 0.7, (slim, full)
