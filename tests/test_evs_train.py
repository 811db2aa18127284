"""EVS training round-trip: train sklearn RF on synthetic labeled
features, export to scoring-model JSON, reload with the vectorized
inference op and verify predictions agree with sklearn."""
import json

import numpy as np
import pytest

from strelka_tpu.ops.rf import load_scoring_model
from strelka_tpu.training import evs_train


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    rng = np.random.default_rng(0)
    n = 2000
    x = rng.normal(size=(n, 5))
    # label depends on two features nonlinearly
    labels = ((x[:, 0] + 0.5 * x[:, 1] ** 2 > 0.5)).astype(int)
    clf = evs_train.train_forest(x, labels, n_trees=20, max_depth=6)
    doc = evs_train.export_model_json(
        clf, [f"F{i}" for i in range(5)], "SNV", "Somatic", 7.0)
    path = tmp_path_factory.mktemp("evs") / "model.json"
    with open(path, "w") as f:
        json.dump(doc, f)
    return clf, str(path), x, labels


def test_export_roundtrip_matches_sklearn(trained):
    clf, path, x, labels = trained
    forest = load_scoring_model(path, "SNV", "Somatic")
    assert forest.n_trees == 20
    # our forest returns mean P(class 0) = P(false positive);
    # sklearn predict_proba[:, 0] is the same quantity
    ours = forest.predict_prob(x[:200])
    theirs = clf.predict_proba(x[:200])[:, 0]
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_scores_separate_classes(trained):
    clf, path, x, labels = trained
    forest = load_scoring_model(path, "SNV", "Somatic")
    scores = forest.score_phred(x)
    assert scores[labels == 1].mean() > scores[labels == 0].mean() + 5


def test_pr_evaluation(trained):
    clf, path, x, labels = trained
    forest = load_scoring_model(path, "SNV", "Somatic")
    pr = evs_train.evaluate_precision_recall(forest, x, labels)
    # at threshold 0 recall is 1; precision rises with threshold
    assert pr[0][2] == 1.0
    assert pr[-1][1] >= pr[0][1]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
