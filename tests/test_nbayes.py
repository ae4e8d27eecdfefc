"""Naive Bayes classifier unit tests (wave 68)."""

import pyarrow as pa
import ray.data as rd

from anonymization_ray.extras.nbayes import naive_bayes_predict


def _predict(rows):
    t = pa.table(
        {
            "doc_id": pa.array(range(len(rows)), pa.int64()),
            "text": pa.array([r[0] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    out = naive_bayes_predict(
        rd.from_arrow(t), text_col="text", label_col="lang", id_col="doc_id"
    ).to_pandas()
    return dict(zip(out["doc_id"], out["pred_label"]))

def test_separable_classes_recovered(ray_session):
    rows = [
        ("le chat noir dort", "fr"),
        ("le chien noir court", "fr"),
        ("the black cat sleeps", "en"),
        ("the black dog runs", "en"),
    ]
    pred = _predict(rows)
    assert pred == {0: "fr", 1: "fr", 2: "en", 3: "en"}


def test_empty_text_emits_no_row(ray_session):
    pred = _predict([("", "en"), ("the the the", "en"), ("le le", "fr")])
    assert 0 not in pred and pred[1] == "en" and pred[2] == "fr"


def test_tie_breaks_to_smallest_class(ray_session):
    # two symmetric one-doc classes: an OOV-free shared vocabulary makes
    # scores equal for a doc containing one word from each — prediction
    # must be the lexicographically smallest class, deterministically
    rows = [("zolt", "aa"), ("zolt", "bb")]
    pred = _predict(rows)
    assert pred == {0: "aa", 1: "aa"}
