"""Fast unit tests for the multi-seed disc selection rule."""


def test_multi_seed_selection_rule():
    """The declared disc-seed selection rule (training.selection.select):
    anchors FN>0 or TP<3 eliminates; among candidates at/above the recall
    floor the LOWEST panel FP wins (ties: lower anchors FP); if none
    reaches the floor, highest recall wins; all eliminated -> None."""
    from pyfaceanalysis_tpu.training.selection import select

    def cand(recall, fp, a_tp=3, a_fp=10, a_fn=0):
        return {"recall": recall, "fp_per_image": fp,
                "anchors": {"tp": a_tp, "fp": a_fp, "fn": a_fn}}

    # FN on anchors eliminates even the best panel score.
    scores = [cand(0.90, 0.2, a_fn=1), cand(0.80, 0.6), cand(0.78, 0.4)]
    assert select(scores, recall_floor=0.73, verbose=False) == 2
    # Above the floor, lowest FP wins even at lower recall.
    scores = [cand(0.85, 1.2), cand(0.75, 0.5)]
    assert select(scores, recall_floor=0.73, verbose=False) == 1
    # FP tie broken by anchors FP.
    scores = [cand(0.80, 0.5, a_fp=15), cand(0.78, 0.5, a_fp=9)]
    assert select(scores, recall_floor=0.73, verbose=False) == 1
    # Nobody at the floor: highest recall.
    scores = [cand(0.60, 0.1), cand(0.70, 2.0)]
    assert select(scores, recall_floor=0.73, verbose=False) == 1
    # Everyone eliminated.
    scores = [cand(0.9, 0.1, a_tp=2), cand(0.9, 0.1, a_fn=2)]
    assert select(scores, recall_floor=0.73, verbose=False) is None
