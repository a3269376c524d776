"""Golden grok-extraction tests re-expressed from
/root/reference/pkg/patterns/patternutils_test.go (TestPatterns :118-321,
TestGenericTsPattern :30-116). Exact reflect.DeepEqual-style map equality."""

from logunifier_spark.functions import grok

PATTERN_CASES = [
    # (pattern_key, input, want)  — patternutils_test.go:118-294
    ("TsLevelMsg",
     "2023-03-20T15:06:45.057Z [DEBUG] nomad: memberlist: Stream connection from=127.0.0.1:48046",
     {"timestamp": "2023-03-20T15:06:45.057Z", "level": "DEBUG",
      "message": "nomad: memberlist: Stream connection from=127.0.0.1:48046"}),
    ("TsLevelMsg",
     "[2023-03-20T15:06:45.057Z] DEBUG nomad: memberlist: Stream connection from=127.0.0.1:48046",
     {"timestamp": "2023-03-20T15:06:45.057Z", "level": "DEBUG",
      "message": "nomad: memberlist: Stream connection from=127.0.0.1:48046"}),
    ("TsLevelMsg",
     "[2023-03-20T15:06:45.057Z] [DEBUG] nomad: memberlist: Stream connection from=127.0.0.1:48046",
     {"timestamp": "2023-03-20T15:06:45.057Z", "level": "DEBUG",
      "message": "nomad: memberlist: Stream connection from=127.0.0.1:48046"}),
    ("TsLevelMsg",
     "2023-03-20T15:06:45.057Z DEBUG nomad: memberlist: Stream connection from=127.0.0.1:48046",
     {"timestamp": "2023-03-20T15:06:45.057Z", "level": "DEBUG",
      "message": "nomad: memberlist: Stream connection from=127.0.0.1:48046"}),
    ("TsLevelMsg",  # nexus
     "2023-03-19 21:17:04,243+0000 INFO [FelixStartLevel] *SYSTEM ROOT - bundle org.apache.felix.scr:2.1.30 (54) Starting with globalExtender setting: false",
     {"timestamp": "2023-03-19 21:17:04,243+0000", "level": "INFO",
      "message": "[FelixStartLevel] *SYSTEM ROOT - bundle org.apache.felix.scr:2.1.30 (54) Starting with globalExtender setting: false"}),
    ("TsLevelMsg",  # keycloak
     "2023-03-20 14:27:28,296 INFO [org.infinispan.CLUSTER] (keycloak-cache-init) ISPN000079: Channel `ISPN` local address is `b52fd99994da-52866`, physical addresses are `[172.26.68.59:37184]`",
     {"timestamp": "2023-03-20 14:27:28,296", "level": "INFO",
      "message": "[org.infinispan.CLUSTER] (keycloak-cache-init) ISPN000079: Channel `ISPN` local address is `b52fd99994da-52866`, physical addresses are `[172.26.68.59:37184]`"}),
    ("TsLevelMsg",  # nats
     "[1] 2023/03/20 14:27:52.652648 [INF] Server is ready",
     {"timestamp": "2023/03/20 14:27:52.652648", "level": "INF",
      "message": "Server is ready"}),
    ("TsLevelMsg",  # apache ts
     "02/Feb/2023:15:04:05 -0700 [INF] Server is ready",
     {"timestamp": "02/Feb/2023:15:04:05 -0700", "level": "INF",
      "message": "Server is ready"}),
    ("TsLevelMsg",  # w3c ts
     "2023-03-27T18:23:45Z [INF] Server is ready",
     {"timestamp": "2023-03-27T18:23:45Z", "level": "INF",
      "message": "Server is ready"}),
    ("TsLevelMsg",
     "2023-03-29 20:50:13.931 [INF] Server is ready",
     {"timestamp": "2023-03-29 20:50:13.931", "level": "INF",
      "message": "Server is ready"}),
    ("Envoy",
     "[2023-03-30 10:51:43.705][42][debug][upstream] [source/common/upstream/upstream_impl.cc:451] transport socket match, socket default selected for host with address 10.21.21.42:9411",
     {"timestamp": "2023-03-30 10:51:43.705", "level": "debug", "thread": "42",
      "message": "[upstream] [source/common/upstream/upstream_impl.cc:451] transport socket match, socket default selected for host with address 10.21.21.42:9411"}),
    ("TsLevelMsg",  # logunifier
     "2025-02-12T17:16:50.575363Z WRN Processor EcsLogChannel Nothing received after 10s",
     {"timestamp": "2025-02-12T17:16:50.575363Z", "level": "WRN",
      "message": "Processor EcsLogChannel Nothing received after 10s"}),
    ("Clf",
     '10.21.0.1 - - [01/Apr/2023:08:33:52 +0000] "GET /v1/acl/token/self HTTP/2.0" 400 44 "-" "-" 79 "nomad@file" "https://10.21.21.41:4646" 7ms',
     {"timestamp": "01/Apr/2023:08:33:52 +0000"}),
    ("Traefik",
     "2024-12-19T18:22:09Z DBG github.com/traefik/traefik/v3/pkg/provider/consulcatalog/consul_catalog.go:287 > Filtering disabled item providerName=consulcatalog serviceName=keycloak-postgres",
     {"timestamp": "2024-12-19T18:22:09Z", "level": "DBG",
      "message": "Filtering disabled item providerName=consulcatalog serviceName=keycloak-postgres",
      "origin": "github.com/traefik/traefik/v3/pkg/provider/consulcatalog/consul_catalog.go",
      "originline": "287"}),
]

GENERIC_TS_CASES = [
    "2023-03-20T15:06:45.057Z",
    "2023-03-20 14:27:28,296",
    "2023-03-19 21:17:04,243+0000",
    "2022-08-04T09:53:59.620557561Z",
    "2023/03/20 14:27:52.652648",
    "02/Feb/2023:15:04:05 -0700",
    "2023-03-27T18:23:45Z",
    "27/Mar/2023:18:23:45-0400",
    "2023-03-29 20:50:13.931",
]


def test_patterns_golden():
    for key, data, want in PATTERN_CASES:
        got = grok.parse_registered(key, data)
        assert got == want, f"[{key}] {data!r}\nwant {want}\ngot  {got}"


def test_generic_ts_golden():
    for data in GENERIC_TS_CASES:
        got = grok.parse_registered("GENERIC_TS", data)
        assert got.get("timestamp") == data, f"{data!r} -> {got}"


def test_no_match_returns_empty():
    assert grok.parse_registered("TsLevelMsg", "Invalid message") == {}


def test_unregistered_keys_filtered():
    # CLF captures 11 groups; only `timestamp` is registered
    got = grok.parse(
        "Clf",
        '10.21.0.1 - - [01/Apr/2023:08:33:52 +0000] "GET /v1 HTTP/2.0" 400 44 "-" "-"')
    assert "client_ip" in got and "status_code" in got
    reg = {k: v for k, v in got.items() if k in grok.REGISTERED_KEYS}
    assert set(reg) == {"timestamp"}
