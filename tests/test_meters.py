import numpy as np
import pytest

from mi_based_regularized_semi_supervised_segmentation_tpu.utils import (
    AverageValueMeter,
    MeterInterface,
    MultipleAverageValueMeter,
    Storage,
    StorageIncomeDict,
    SurfaceMeter,
    UniversalDice,
)


def test_average_value_meter():
    m = AverageValueMeter()
    for v in [1.0, 2.0, 3.0]:
        m.add(v)
    assert np.isclose(m.mean, 2.0)
    assert np.isclose(m.std, 1.0)
    m.reset()
    assert np.isnan(m.mean)


def test_multiple_average_value_meter():
    m = MultipleAverageValueMeter()
    m.add(a=1.0, b=2.0)
    m.add(a=3.0)
    s = m.summary()
    assert np.isclose(s["a"], 2.0) and np.isclose(s["b"], 2.0)


def test_universal_dice_known_masks():
    m = UniversalDice(C=2, report_axises=[1])
    pred = np.array([[[1, 1], [0, 0]]])    # 2 fg pixels
    target = np.array([[[1, 0], [0, 0]]])  # 1 fg pixel, 1 overlapping
    m.add(pred, target)
    s = m.summary()
    # dice_fg = 2*1/(2+1) = 2/3
    assert np.isclose(s["DSC1"], 2 / 3, atol=1e-5)
    assert np.isclose(s["DSC_mean"], 2 / 3, atol=1e-5)


def test_universal_dice_grouping_volume_semantics():
    """Two slices of one patient are pooled (volume dice), separate patients
    averaged — the reference's per-patient pseudo-3D dice."""
    m = UniversalDice(C=2, report_axises=[1])
    # patient A slice 1: perfect; slice 2: empty pred vs 2 fg pixels
    m.add(np.array([[[1, 1]]]), np.array([[[1, 1]]]), group_name="A")
    m.add(np.array([[[0, 0]]]), np.array([[[1, 1]]]), group_name="A")
    # patient B: perfect
    m.add(np.array([[[1, 0]]]), np.array([[[1, 0]]]), group_name="B")
    s = m.summary()
    # A: I=2, U=2+4 => dice=4/6=2/3 ; B: dice=1 ; mean=5/6
    assert np.isclose(s["DSC1"], (2 / 3 + 1.0) / 2, atol=1e-4)


def test_universal_dice_add_stats_equivalent():
    m1 = UniversalDice(C=3)
    m2 = UniversalDice(C=3)
    rng = np.random.default_rng(0)
    pred = rng.integers(0, 3, size=(4, 8, 8))
    target = rng.integers(0, 3, size=(4, 8, 8))
    m1.add(pred, target, group_name=["p1", "p1", "p2", "p2"])
    inter = np.zeros((4, 3))
    union = np.zeros((4, 3))
    for c in range(3):
        inter[:, c] = ((pred == c) & (target == c)).sum(axis=(1, 2))
        union[:, c] = (pred == c).sum(axis=(1, 2)) + (target == c).sum(axis=(1, 2))
    m2.add_stats(inter, union, group_name=["p1", "p1", "p2", "p2"])
    assert m1.summary() == m2.summary()


def test_surface_meter_hausdorff():
    m = SurfaceMeter(C=2, report_axises=[1], metername="hausdorff")
    a = np.zeros((1, 16, 16), dtype=int)
    b = np.zeros((1, 16, 16), dtype=int)
    a[0, 4:8, 4:8] = 1
    b[0, 4:8, 4:8] = 1
    m.add(a, b)
    assert np.isclose(m.summary()["hausdorff1"], 0.0)
    m2 = SurfaceMeter(C=2, report_axises=[1])
    c = np.zeros((1, 16, 16), dtype=int)
    c[0, 6:10, 4:8] = 1  # shifted by 2
    m2.add(a, c)
    assert m2.summary()["hausdorff1"] >= 2.0


def _brute_surface_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """O(n^2) oracle for medpy's __surface_distances semantics (border via
    4-connected erosion with border_value=0; exact Euclidean distance from
    each a-border voxel to the NEAREST b-border voxel)."""

    def border(m):
        m = m.astype(bool)
        pad = np.pad(m, 1, constant_values=False)
        inner = (
            pad[:-2, 1:-1] & pad[2:, 1:-1] & pad[1:-1, :-2] & pad[1:-1, 2:] & m
        )
        return np.argwhere(m & ~inner)

    pa, pb = border(a), border(b)
    d = np.sqrt(((pa[:, None, :] - pb[None, :, :]) ** 2).sum(-1))
    return d.min(axis=1)


@pytest.mark.parametrize("method", ["hausdorff", "hd95", "assd"])
def test_surface_meter_matches_bruteforce_oracle(method, rng):
    """scipy-EDT SurfaceMeter == brute-force surface-distance oracle (the
    medpy parity check: medpy isn't installed here, but its documented
    algorithm — erosion borders + EDT — is reproduced exactly)."""
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils.meters import (
        _surface_distances,
    )

    for _ in range(5):
        a = np.zeros((24, 24), bool)
        b = np.zeros((24, 24), bool)
        ya, xa = rng.integers(2, 10, 2)
        yb, xb = rng.integers(2, 10, 2)
        a[ya:ya + rng.integers(3, 10), xa:xa + rng.integers(3, 10)] = True
        b[yb:yb + rng.integers(3, 10), xb:xb + rng.integers(3, 10)] = True
        got = np.sort(_surface_distances(a, b))
        want = np.sort(_brute_surface_distances(a, b))
        np.testing.assert_allclose(got, want, atol=1e-6)

        m = SurfaceMeter(C=2, report_axises=[1], metername=method)
        m.add(a.astype(int), b.astype(int))  # 2D: border semantics match oracle
        d_ab = _brute_surface_distances(a, b)
        d_ba = _brute_surface_distances(b, a)
        if method == "hausdorff":
            expect = max(d_ab.max(), d_ba.max())
        elif method == "hd95":
            expect = max(np.percentile(d_ab, 95), np.percentile(d_ba, 95))
        else:
            expect = (d_ab.sum() + d_ba.sum()) / (len(d_ab) + len(d_ba))
        np.testing.assert_allclose(m.summary()[f"{method}1"], expect, atol=1e-6)


def test_meter_interface_and_storage(tmp_path):
    meters = MeterInterface()
    meters.register_meter("loss", AverageValueMeter())
    meters.register_meter("dice", UniversalDice(C=2, report_axises=[1]))
    with meters:
        meters["loss"].add(0.5)
        meters["dice"].add(np.array([[[1, 1]]]), np.array([[[1, 1]]]), group_name="A")
        status = meters.tracking_status()
    assert np.isclose(status["loss"]["mean"], 0.5)
    assert np.isclose(status["dice"]["DSC1"], 1.0)

    storage = Storage()
    storage.put_from_dict(StorageIncomeDict(tra=status, val={"loss": {"mean": 0.1}}), epoch=0)
    storage.put_from_dict(StorageIncomeDict(tra={"loss": {"mean": 0.2}}), epoch=1)
    storage.to_csv(str(tmp_path))
    csv = (tmp_path / "storage.csv").read_text()
    assert "tra_loss_mean" in csv and "val_loss_mean" in csv

    state = storage.state_dict()
    s2 = Storage()
    s2.load_state_dict(state)
    assert s2.summary().equals(storage.summary())


def test_confusion_meter():
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils.meters import (
        ConfusionMeter,
    )

    m = ConfusionMeter(3)
    m.add([0, 1, 2, 2], [0, 1, 2, 1])
    conf = m.value()
    assert conf[0, 0] == 1 and conf[1, 1] == 1 and conf[2, 2] == 1
    assert conf[1, 2] == 1  # target 1 predicted 2
    assert np.isclose(m.summary()["acc"], 3 / 4)
    d = m.detailed_summary()
    assert np.isclose(d["recall1"], 0.5)
    mn = ConfusionMeter(3, normalized=True)
    mn.add([0, 1, 2, 2], [0, 1, 2, 1])
    assert np.allclose(mn.value().sum(axis=1), [1, 1, 1])


def test_time_meter():
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils.meters import (
        TimeMeter,
    )

    m = TimeMeter()
    m.add(10)
    s = m.summary()
    assert s["rate"] > 0 and s["elapsed"] > 0


# --- torchnet classification-meter zoo (round 3: closes the r2 partial) -----

def test_auc_meter_perfect_and_random():
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils import AUCMeter

    m = AUCMeter()
    assert m.value()[0] == 0.5  # empty
    m.add([0.9, 0.8, 0.2, 0.1], [1, 1, 0, 0])
    auc, tpr, fpr = m.value()
    assert auc == 1.0
    assert tpr[-1] == 1.0 and fpr[-1] == 1.0
    m.reset()
    m.add([0.9, 0.1, 0.8, 0.2], [0, 1, 1, 0])  # one inversion each way
    assert 0.0 < m.value()[0] < 1.0


def test_auc_meter_matches_sklearn_formula():
    # rank-based AUC equals the Mann-Whitney statistic
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils import AUCMeter

    rng = np.random.default_rng(0)
    scores = rng.random(200)
    targets = (rng.random(200) < 0.4).astype(int)
    m = AUCMeter()
    m.add(scores, targets)
    pos, neg = scores[targets == 1], scores[targets == 0]
    mw = np.mean(pos[:, None] > neg[None, :]) + 0.5 * np.mean(pos[:, None] == neg[None, :])
    assert abs(m.value()[0] - mw) < 1e-9


def test_ap_meter_and_map():
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils import (
        APMeter,
        mAPMeter,
    )

    m = APMeter()
    # class 0 perfectly ranked, class 1 inverted
    m.add([[0.9, 0.1], [0.8, 0.6], [0.1, 0.9]],
          [[1, 1], [1, 0], [0, 0]])
    ap = m.value()
    assert ap.shape == (2,)
    assert ap[0] == 1.0
    assert ap[1] < 1.0
    mm = mAPMeter()
    mm.add([[0.9], [0.1]], [[1], [0]])
    assert mm.value() == 1.0
    # weighted: duplicating a sample == weighting it 2x
    a, b = APMeter(), APMeter()
    a.add([[0.9], [0.7], [0.3]], [[1], [0], [1]], weight=[1, 2, 1])
    b.add([[0.9], [0.7], [0.7], [0.3]], [[1], [0], [0], [1]])
    np.testing.assert_allclose(a.value(), b.value(), rtol=1e-12)


def test_class_error_meter_topk():
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils import (
        ClassErrorMeter,
    )

    m = ClassErrorMeter(topk=[1, 2])
    out = np.array([[0.1, 0.7, 0.2],   # pred 1, target 1: top1 ok
                    [0.6, 0.3, 0.1],   # pred 0, target 1: top1 wrong, top2 ok
                    [0.2, 0.3, 0.5]])  # pred 2, target 0: both wrong
    m.add(out, [1, 1, 0])
    assert m.value(1) == pytest.approx(100.0 * 2 / 3)
    assert m.value(2) == pytest.approx(100.0 * 1 / 3)
    acc = ClassErrorMeter(topk=[1], accuracy=True)
    acc.add(out, [1, 1, 0])
    assert acc.value(1) == pytest.approx(100.0 / 3)


def test_moving_average_and_mse_meters():
    from mi_based_regularized_semi_supervised_segmentation_tpu.utils import (
        MovingAverageValueMeter,
        MSEMeter,
    )

    m = MovingAverageValueMeter(3)
    for v in (1.0, 2.0, 3.0, 4.0):  # window keeps [2, 3, 4]
        m.add(v)
    mean, std = m.value()
    assert mean == pytest.approx(3.0)
    assert std == pytest.approx(1.0)
    e = MSEMeter(root=True)
    e.add([0.0, 0.0], [3.0, 4.0])
    assert e.value() == pytest.approx(np.sqrt(12.5))
