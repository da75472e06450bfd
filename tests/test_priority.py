"""Winner-priority semantics (reference A1/A7 weight adjustment):
lower priority wins canonical selection; url is the stable tie-break."""

import pyarrow as pa
import ray.data

from dedup_ray.config import DedupConfig
from dedup_ray.pipelines.flagship import cluster_and_assign
from dedup_ray.stages.exact import exact_members
from dedup_ray.stages.hashing import add_content_sha256


def _pages(rows):
    return ray.data.from_arrow(pa.table(rows))


def test_exact_winner_respects_priority():
    rows = {
        "url": ["a", "b", "c", "z"],
        "text": ["same text here"] * 3 + ["other thing"],
        "lang": ["en"] * 4,
        # url "c" has the LOWEST priority value -> wins despite name
        "priority": pa.array([5, 5, 1, 0], pa.int64()),
    }
    members = exact_members(add_content_sha256(_pages(rows))).to_pandas().set_index("url")
    assert members.loc["c", "is_exact_winner"]
    assert not members.loc["a", "is_exact_winner"]
    assert not members.loc["b", "is_exact_winner"]
    assert (members.loc[["a", "b", "c"], "winner_url"] == "c").all()


def test_exact_winner_url_tiebreak():
    rows = {
        "url": ["bb", "aa", "cc"],
        "text": ["dup"] * 3,
        "lang": ["en"] * 3,
        "priority": pa.array([3, 3, 3], pa.int64()),
    }
    members = exact_members(add_content_sha256(_pages(rows))).to_pandas().set_index("url")
    assert members.loc["aa", "is_exact_winner"]


def test_cluster_canonical_nonuniform_priority():
    """The general canonical-selection path (groupby per cluster) when
    priorities are not uniform."""
    rows = {
        "url": ["a", "b", "c"],
        "text": ["identical content x"] * 2 + ["unique stuff y"],
        "lang": ["en"] * 3,
        "priority": pa.array([2, 1, 0], pa.int64()),
    }
    members = exact_members(add_content_sha256(_pages(rows)))
    import ray.data as rd

    empty_edges = pa.table(
        {
            "u": pa.array([], pa.string()),
            "v": pa.array([], pa.string()),
            "kind": pa.array([], pa.string()),
            "score": pa.array([], pa.float64()),
        }
    )
    out = cluster_and_assign(
        members,
        rd.from_arrow(empty_edges),
        DedupConfig(),
        assume_uniform_priority=False,
    ).to_pandas().set_index("url")
    # b (priority 1) beats a (priority 2) inside the duplicate cluster
    assert out.loc["b", "is_canonical"]
    assert not out.loc["a", "is_canonical"]
    assert out.loc["c", "is_canonical"]


def test_entrypoint_derives_priority_from_cfg(ray_session):
    """flagship_assignments_from_pages must derive canonical selection
    from cfg.uniform_priority (it hard-coded the uniform default,
    contradicting config.py's promise that priority_col changes winner
    selection in members AND assignments)."""
    import pyarrow as pa
    import ray.data

    from dedup_ray.config import DedupConfig
    from dedup_ray.pipelines.flagship import flagship_assignments_from_pages

    base = " ".join(f"tok{j}" for j in range(300))
    pages = ray.data.from_arrow(
        pa.table(
            {
                "url": pa.array(["https://a/", "https://b/"], pa.string()),
                "text": pa.array([base, base.replace("tok5", "tweak")], pa.string()),
                "lang": pa.array(["en", "en"], pa.string()),
                # near-dup pair; min-url 'a' has the WORSE priority
                "priority": pa.array([2, 0], pa.int64()),
            }
        )
    )
    out = flagship_assignments_from_pages(
        pages, DedupConfig(priority_col="priority")
    ).to_pandas()
    assert out["cluster_id"].nunique() == 1
    assert out[out["is_canonical"]]["url"].tolist() == ["https://b/"]
