"""Golden journald-converter tests using the reference's own captured
payloads (/root/reference/internal/streams/ingress/journald/testUtils.go:
10-71, asserted per journald_test.go). Each payload drives
journald_envelope → unify and checks pattern key, level, message, and
service/host metadata."""

import json

from pyspark.sql import functions as F

# testJournaldNomadLog (testUtils.go) — tslevelmsg via logunifier label,
# nomad SYSTEMD unit, facility 3, PRIORITY 6
NOMAD = {
    "COM_GITHUB_LOGUNIFIER_APPLICATION_PATTERN_KEY": "tsLevelMsg",
    "PRIORITY": "6", "SYSLOG_FACILITY": "3", "SYSLOG_IDENTIFIER": "nomad",
    "_MACHINE_ID": "ceacb99587e34bcc840bc7a7cc0d4453",
    "_SYSTEMD_UNIT": "nomad.service", "_SYSTEMD_SLICE": "system.slice",
    "__REALTIME_TIMESTAMP": "1679324805057689",
    "host": "master-01",
    "message": "    2023-03-20T15:06:45.057Z [DEBUG] nomad: memberlist: "
               "Stream connection from=127.0.0.1:48046",
}

# testJournaldLogunifier — strip-ansi + tslevelmsg + nomad alloc + container
LOGUNIFIER = {
    "COM_GITHUB_LOGUNIFIER_APPLICATION_NAME": "logunifier",
    "COM_GITHUB_LOGUNIFIER_APPLICATION_PATTERN_KEY": "tslevelmsg",
    "COM_GITHUB_LOGUNIFIER_APPLICATION_VERSION": "0.1.0",
    "COM_GITHUB_LOGUNIFIER_APPLICATION_STRIP_ANSI": "true",
    "COM_HASHICORP_NOMAD_ALLOC_ID": "bab93287-6e17-1849-22cc-7449612bf642",
    "COM_HASHICORP_NOMAD_JOB_NAME": "observability",
    "COM_HASHICORP_NOMAD_NAMESPACE": "default",
    "COM_HASHICORP_NOMAD_TASK_NAME": "logunifier",
    "CONTAINER_NAME": "logunifier-bab93287-6e17-1849-22cc-7449612bf642",
    "CONTAINER_TAG": "44d89924c110",
    "PRIORITY": "6",
    "__REALTIME_TIMESTAMP": "1680207232774527",
    "host": "worker-01",
    "message": "[90m2023-03-30T20:13:52.774125Z[0m "
               "[33mDBG[0m Nothing to validate after 10s ",
}

# testJournaldGrafanaLog — logfmt pattern, app name label, container
GRAFANA = {
    "COM_GITHUB_LOGUNIFIER_APPLICATION_NAME": "grafana",
    "COM_GITHUB_LOGUNIFIER_APPLICATION_PATTERN_KEY": "logfmt",
    "COM_GITHUB_LOGUNIFIER_APPLICATION_VERSION": "9.4.3.0",
    "COM_HASHICORP_NOMAD_ALLOC_ID": "07ab1dac-04f7-fe70-b7d7-da2f0a488776",
    "COM_HASHICORP_NOMAD_JOB_NAME": "observability",
    "COM_HASHICORP_NOMAD_TASK_NAME": "grafana",
    "CONTAINER_NAME": "grafana-07ab1dac-04f7-fe70-b7d7-da2f0a488776",
    "PRIORITY": "6",
    "__REALTIME_TIMESTAMP": "1678999436275223",
    "host": "worker-01",
    "message": 'logger=live t=2023-03-16T20:43:56.274825539Z level=info '
               'msg="Initialized channel handler" '
               'channel=grafana/dashboard/uid/KMg_v90Vz '
               'address=grafana/dashboard/uid/KMg_v90Vz',
}


def _envelope(spark, payload):
    from logunifier_spark.sources.journald import journald_envelope
    df = spark.createDataFrame([(json.dumps(payload),)], "raw string")
    return journald_envelope(df).collect()[0]


def test_nomad_tslevelmsg_golden(spark):
    r = _envelope(spark, NOMAD)
    # journald_test.go: pattern key from label (case-insensitive), level
    # falls back to PRIORITY 6 → info, facility 3 → daemon job type,
    # service name via the systemd-unit precedence
    assert r["log_pattern_key"] == "TsLevelMsg"
    assert r["fallback_level"] == "info"
    assert r["service_type"] == "daemon"
    assert r["service_name"] == "nomad.service"
    assert r["host_name"] == "master-01"
    assert str(r["ts"]) == "2023-03-20 15:06:45.057689"
    # and the grok parse of the message itself (leading whitespace tolerated
    # by the MULTILINE prefix)
    from logunifier_spark.functions import grok
    got = grok.parse_registered("TsLevelMsg", NOMAD["message"])
    assert got["timestamp"] == "2023-03-20T15:06:45.057Z"
    assert got["level"] == "DEBUG"


def test_logunifier_strip_ansi_golden(spark):
    r = _envelope(spark, LOGUNIFIER)
    assert r["log_pattern_key"] == "TsLevelMsg"
    # ANSI escapes stripped by the per-row gate
    assert "" not in r["text"]
    assert r["text"].startswith("2023-03-30T20:13:52.774125Z DBG ")
    # nomad alloc present → job type nomad_job → level not_set
    assert r["service_type"] == "nomad_job"
    assert r["fallback_level"] == "not_set"
    # app name label wins the precedence cascade
    assert r["service_name"] == "logunifier"
    assert r["service_version"] == "0.1.0"
    assert list(r["tags"]) == ["44d89924c110"]


def test_grafana_logfmt_golden(spark):
    from logunifier_spark.functions import logfmt
    r = _envelope(spark, GRAFANA)
    assert r["log_pattern_key"] == "LogFmt"
    assert r["service_name"] == "grafana"
    kv, errs = logfmt.decode(r["text"])
    assert errs == []
    assert kv["msg"] == "Initialized channel handler"
    assert kv["level"] == "info"
    assert kv["ts"] == "2023-03-16T20:43:56.274825539Z"
    assert kv["logger"] == "live"
