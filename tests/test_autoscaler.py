"""Autoscaler policy tests — the pure `desired_replicas` function, exercised
without a cluster (reference policy: deployment/auto_scaler.py:66-111)."""

from deployment.auto_scaler import ScalerConfig, desired_replicas

CFG = ScalerConfig(min_replicas=1, max_replicas=4, queue_size_per_replica=30,
                   wait_threshold=5.0, low_wait_threshold=1.0,
                   idle_threshold=300, min_idle_replicas=0)


def test_idle_scales_to_zero():
    assert desired_replicas(0, 0.0, 3, idle_seconds=301, cfg=CFG) == 0


def test_not_yet_idle_keeps_min():
    assert desired_replicas(0, 0.0, 1, idle_seconds=10, cfg=CFG) == 1


def test_size_based_scaling():
    assert desired_replicas(0, 0.0, 1, 0, CFG) == 1
    assert desired_replicas(29, 0.0, 1, 0, CFG) == 1
    assert desired_replicas(30, 2.0, 1, 0, CFG) == 2
    assert desired_replicas(90, 2.0, 1, 0, CFG) == 4
    assert desired_replicas(500, 2.0, 1, 0, CFG) == 4  # clamped to max


def test_high_wait_adds_replica():
    assert desired_replicas(10, 6.0, 1, 0, CFG) == 2
    assert desired_replicas(500, 6.0, 4, 0, CFG) == 4  # still clamped


def test_low_wait_gradual_downscale():
    # current 4, size-based 1, low wait → step down by one, not jump
    assert desired_replicas(5, 0.5, 4, 0, CFG) == 3
    assert desired_replicas(5, 0.5, 3, 0, CFG) == 2
    assert desired_replicas(5, 0.5, 2, 0, CFG) == 1


def test_mid_wait_holds_size_based():
    # wait between thresholds: no up-scale, no gradual decrement
    assert desired_replicas(35, 3.0, 4, 0, CFG) == 2
