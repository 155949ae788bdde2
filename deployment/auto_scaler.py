"""Kubernetes autoscaler for the RAG service (reference: deployment/auto_scaler.py).

Reads Redis queue depth + oldest-item wait (the `timestamp` field contract in
the queue payload) and patches the Deployment's replica count. The policy is
identical to the reference's (auto_scaler.py:66-111) but factored into a pure
function (`desired_replicas`) so it is unit-testable without a cluster:

- queue empty for >= IDLE_THRESHOLD s       → MIN_IDLE_REPLICAS (scale-to-zero)
- else size-based: clamp(size // QUEUE_SIZE_PER_REPLICA + 1, MIN, MAX)
- wait > WAIT_THRESHOLD                     → +1 (clamped to MAX)
- wait < LOW_WAIT_THRESHOLD and current > size-based → gradual -1
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass


@dataclass
class ScalerConfig:
    min_replicas: int = int(os.environ.get("MIN_REPLICAS", "1"))
    max_replicas: int = int(os.environ.get("MAX_REPLICAS", "4"))
    queue_size_per_replica: int = int(os.environ.get("QUEUE_SIZE_PER_REPLICA", "30"))
    wait_threshold: float = float(os.environ.get("WAIT_THRESHOLD", "5.0"))
    low_wait_threshold: float = float(os.environ.get("LOW_WAIT_THRESHOLD", "1.0"))
    idle_threshold: float = float(os.environ.get("IDLE_THRESHOLD", "300"))
    min_idle_replicas: int = int(os.environ.get("MIN_IDLE_REPLICAS", "0"))
    check_interval: float = float(os.environ.get("CHECK_INTERVAL", "15"))


def desired_replicas(queue_size: int, wait_time: float, current_replicas: int,
                     idle_seconds: float, cfg: ScalerConfig) -> int:
    """Pure scaling policy. `idle_seconds` = how long the queue has been empty."""
    if queue_size == 0 and idle_seconds >= cfg.idle_threshold:
        return cfg.min_idle_replicas
    size_based = max(cfg.min_replicas,
                     min(cfg.max_replicas,
                         queue_size // cfg.queue_size_per_replica + 1))
    if wait_time > cfg.wait_threshold:
        return min(cfg.max_replicas, size_based + 1)
    if wait_time < cfg.low_wait_threshold and current_replicas > size_based:
        return max(size_based, current_replicas - 1)
    return size_based


def get_queue_metrics(redis_client, queue_key: str) -> tuple[int, float]:
    queue_size = redis_client.llen(queue_key)
    wait_time = 0.0
    if queue_size > 0:
        try:
            oldest = redis_client.lindex(queue_key, 0)
            if oldest:
                data = json.loads(oldest)
                if "timestamp" in data:
                    wait_time = time.time() - data["timestamp"]
        except Exception as e:
            print(f"error calculating wait time: {e}")
    return queue_size, wait_time


def autoscale_loop() -> None:
    import redis
    from kubernetes import client, config

    config.load_incluster_config()
    apps = client.AppsV1Api()
    r = redis.from_url(os.environ.get("REDIS_URL", "redis://redis-service:6379/0"))

    namespace = os.environ.get("NAMESPACE", "default")
    deployment = os.environ.get("DEPLOYMENT_NAME", "rag-service")
    queue_key = os.environ.get("QUEUE_KEY", "rag_service:requests")
    cfg = ScalerConfig()

    idle_start: float | None = None
    while True:
        try:
            queue_size, wait_time = get_queue_metrics(r, queue_key)
            print(f"queue size={queue_size} wait={wait_time:.2f}s")

            if queue_size == 0:
                idle_start = idle_start or time.time()
            else:
                idle_start = None
            idle_seconds = time.time() - idle_start if idle_start else 0.0

            current = apps.read_namespaced_deployment(
                name=deployment, namespace=namespace).spec.replicas
            target = desired_replicas(queue_size, wait_time, current,
                                      idle_seconds, cfg)
            if target != current:
                print(f"scaling {deployment}: {current} -> {target}")
                apps.patch_namespaced_deployment_scale(
                    name=deployment, namespace=namespace,
                    body={"spec": {"replicas": target}})
        except Exception as e:
            print(f"autoscaler loop error: {e}")
        time.sleep(cfg.check_interval)


if __name__ == "__main__":
    print("starting RAG service autoscaler (TPU build)")
    autoscale_loop()
