"""Host-profile mitigation helpers (session.py): pure-dict unit tests —
the live session is a process-wide singleton, so the helpers are tested
directly rather than through getOrCreate."""
from __future__ import annotations

import fireworks_spark.session as session


def test_host_profile_env_pins_glibc_malloc():
    env = session._host_profile_env()
    # large-threshold pinning: big allocations go to the brk heap and the
    # heap never trims, so re-faulting (and the mmap-lock write path) is
    # off the hot path for the JVM and every forked python worker
    assert int(env["MALLOC_MMAP_THRESHOLD_"]) >= 1 << 30
    assert int(env["MALLOC_TRIM_THRESHOLD_"]) >= 1 << 30


def test_host_profile_conf_defaults(monkeypatch):
    for var in (
        "FIREWORKS_FILE_TRANSFERTO",
        "FIREWORKS_BYPASS_MERGE_THRESHOLD",
        "FIREWORKS_DRIVER_JAVA_OPTIONS",
    ):
        monkeypatch.delenv(var, raising=False)
    conf = session._host_profile_conf("8g")
    assert conf["spark.file.transferTo"] == "false"
    assert conf["spark.shuffle.sort.bypassMergeThreshold"] == "1"
    assert "-Xms8g" in conf["spark.driver.extraJavaOptions"]
    assert "-XX:+AlwaysPreTouch" in conf["spark.driver.extraJavaOptions"]


def test_host_profile_conf_env_overrides(monkeypatch):
    monkeypatch.setenv("FIREWORKS_FILE_TRANSFERTO", "true")
    monkeypatch.setenv("FIREWORKS_BYPASS_MERGE_THRESHOLD", "200")
    monkeypatch.setenv("FIREWORKS_DRIVER_JAVA_OPTIONS", "-Xmx2g")
    conf = session._host_profile_conf("8g")
    assert conf["spark.file.transferTo"] == "true"
    assert conf["spark.shuffle.sort.bypassMergeThreshold"] == "200"
    assert conf["spark.driver.extraJavaOptions"] == "-Xmx2g"
