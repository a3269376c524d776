import hashlib


def test_mine_templates_masks_and_rolls_up(spark):
    from logunifier_spark.operators.templates import mine_templates
    rows = [("req 123 took 45ms",), ("req 7 took 8ms",),
            ("deadbeef00 session start",), ("CAFEBABE11 session start",),
            ("odd line",), (None,)]
    df = spark.createDataFrame(rows, "text string")
    out = {r["template"]: r for r in mine_templates(df).collect()}
    assert set(out) == {"req <N> took <N>ms", "<HEX> session start",
                        "odd line"}
    t = out["req <N> took <N>ms"]
    assert t["hits"] == 2 and t["example"] == "req 123 took 45ms"
    assert out["<HEX> session start"]["hits"] == 2
    # example is the lexicographic min of the family's raw lines
    assert out["<HEX> session start"]["example"] == "CAFEBABE11 session start"
    # template_id is the md5 prefix of the template — portable/stable
    assert t["template_id"] == \
        hashlib.md5(b"req <N> took <N>ms").hexdigest()[:16]


def test_long_digit_runs_mask_as_hex(spark):
    # ordered rules: a >=8 digit run is hex-maskable and rule 1 wins
    from logunifier_spark.operators.templates import mine_templates
    df = spark.createDataFrame([("id 12345678 ok",), ("id 1234567 ok",)],
                               "text string")
    got = {r["template"] for r in mine_templates(df).collect()}
    assert got == {"id <HEX> ok", "id <N> ok"}


def test_template_outliers_review_queue(spark):
    from logunifier_spark.operators.templates import template_outliers
    rows = [(i, f"req {i} took {i}ms") for i in range(10)] + \
           [(99, "segfault at deadbeefcafe")]
    df = spark.createDataFrame(rows, "id long, text string")
    out = template_outliers(df, min_hits=5).collect()
    assert len(out) == 1
    assert out[0]["id"] == 99 and out[0]["hits"] == 1
