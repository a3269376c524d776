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


# testNatviceEcs (testUtils.go) embedded as the message of a journald row
# with pattern key `ecs` — the delegation path (journald.go:134-146)
NATIVE_ECS_MSG = (
    '{"@timestamp":"2023-06-07T15:08:51.584+02:00","ecs":{"version":"1.3.0"},'
    '"log":{"level":"DEBUG","thread_name":"main",'
    '"logger":"com.boxbay.wms.internal.test.curd.WmsCrudTest",'
    '"origin":{"file":{"line":"56","name":"StartupInfoLogger.java"},'
    '"function":"logStarting"}},'
    '"service":{"name":"boxbay-wms-test"},'
    '"organization":{"name":"boxbay"},'
    '"host":{"hostname":"WAP130259","name":"WAP130259"},'
    '"message":"Running with Spring Boot v2.4.4, Spring v5.3.5"}'
)


def _unify_raw(spark, payloads):
    from logunifier_spark.pipeline import unify_journald
    df = spark.createDataFrame([(json.dumps(p) if isinstance(p, dict) else p,)
                                for p in payloads], "raw string")
    return unify_journald(df).collect()


def test_unify_journald_end_to_end(spark):
    rows = _unify_raw(spark, [NOMAD, GRAFANA])
    by_svc = {r["service_name"]: r for r in rows}
    nomad = by_svc["nomad.service"]
    # grok parsed level wins over the PRIORITY fallback
    assert nomad["log_level"] == "debug"
    assert nomad["message"].startswith("nomad: memberlist:")
    assert nomad["service_type"] == "daemon"      # facility 3 (override)
    assert nomad["host_name"] == "master-01"
    graf = by_svc["grafana"]
    assert graf["log_level"] == "info"            # logfmt level
    assert graf["message"] == "Initialized channel handler"
    assert graf["service_type"] == "nomad_job"
    assert graf["service_version"] == "9.4.3.0"
    assert graf["service_stack"] == "observability"


def test_unify_journald_priority_fallback_for_nop(spark):
    # no pattern key label → Nop → extractor leaves level untouched →
    # PRIORITY 4 → warn (toMetaLog fallback, journald.go:160-185)
    p = {"PRIORITY": "4", "SYSLOG_FACILITY": "1", "SYSLOG_IDENTIFIER": "x",
         "__REALTIME_TIMESTAMP": "1679324805057689",
         "host": "h1", "message": "free text line"}
    r = _unify_raw(spark, [p])[0]
    assert r["log_pattern_key"] == "Nop"
    assert r["log_level"] == "warn"
    assert r["message"] == "free text line"
    assert r["service_type"] == "user"            # facility 1


def test_unify_journald_ecs_delegation_override(spark):
    # pattern key `ecs`: the message is parsed as native ECS, then journald
    # metadata overrides service/host/org/env (journald.go:134-146,190-275)
    p = dict(GRAFANA)
    p["COM_GITHUB_LOGUNIFIER_APPLICATION_PATTERN_KEY"] = "ecs"
    p["message"] = NATIVE_ECS_MSG
    r = _unify_raw(spark, [p])[0]
    assert r["log_pattern_key"] == "Ecs"
    assert r["message"] == "Running with Spring Boot v2.4.4, Spring v5.3.5"
    assert r["log_level"] == "debug"              # from the ECS json
    assert r["log_logger"] == "com.boxbay.wms.internal.test.curd.WmsCrudTest"
    # journald wins over the ECS json's own metadata:
    assert r["service_name"] == "grafana"         # not boxbay-wms-test
    # GRAFANA carries no ORG label → override "" → validate default
    assert r["org_name"] == "NoOrg"               # not boxbay
    assert r["host_name"] == "worker-01"          # not WAP130259


def test_unify_journald_corrupt_payload(spark):
    rows = _unify_raw(spark, ["this is not json at all"])
    r = rows[0]
    assert r["process_error_reason"] == "can't unmarshal journald json"
    assert r["process_error_raw_data"] == "this is not json at all"
    assert r["log_pattern_key"] == "Nop"


def test_unify_journald_dedup_not_truncated_to_31_bits(spark):
    # Two DISTINCT payloads on one host engineered to collide in
    # pmod(xxhash64(raw), 2^31) — the display turn_idx. A dedup keyed on the
    # truncated hash would silently merge them (birthday bound ~65k
    # lines/host); the dedup key is the full 64-bit payload hash, so both
    # rows must survive, while a TRUE duplicate payload still collapses.
    a = '{"message":"collide 146512","PRIORITY":"6","host":"h1"}'
    b = '{"message":"collide 221228","PRIORITY":"6","host":"h1"}'
    rows = _unify_raw(spark, [a, b, b])  # b duplicated: JetStream-style dedup
    msgs = sorted(r["message"] for r in rows)
    assert msgs == ["collide 146512", "collide 221228"]
    # both rows really do share the 31-bit display turn_idx
    idxs = {r["turn_idx"] for r in rows}
    assert len(idxs) == 1
