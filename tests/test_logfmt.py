"""Golden logfmt-decode tests re-expressed from
/root/reference/pkg/utils/logfmtutils_test.go (TestValidKvs :45-141,
TestInValidKvs :142-214, TestIsKey :9-44)."""

from logunifier_spark.functions.logfmt import _is_key, decode

VALID = [
    ("a=1", {"a": "1"}),
    ("a=1 b=2", {"a": "1", "b": "2"}),
    ("a=1 b=1 d=", {"a": "1", "b": "1", "d": ""}),
    ('a=1 b=1 d=""', {"a": "1", "b": "1", "d": ""}),
    ('a=1 b=1 multiline="line1\nline2"',
     {"a": "1", "b": "1", "multiline": "line1\nline2"}),
    ('multiline="line1\nline2"', {"multiline": "line1\nline2"}),
    ("a= b= c=2", {"a": "", "b": "", "c": "2"}),
    ("a@1=2 b= c=2", {"a@1": "2", "b": "", "c": "2"}),
]

INVALID = [
    ("you got it a=1 b= ", {"a": "1", "b": "", "msg": "you got it"}),
    ("a=1 you got it b= ", {"a": "1", "b": "", "msg": "you got it"}),
    ("a=1 b= you got it", {"a": "1", "b": "", "msg": "you got it"}),
    ('ts msg level is info msg="the only valid stuff here" spanID msg user not valid msg="is 42"',
     {"msg": "the only valid stuff here is 42",
      "trash": "ts msg level is info spanID msg user not valid"}),
    ("The only message here is gabare@localhost",
     {"msg": "The only message here is gabare@localhost"}),
]


def test_valid_kvs():
    for data, want in VALID:
        got, errs = decode(data)
        assert got == want, f"{data!r}: {got}"
        assert errs == [], f"{data!r}: unexpected errors {errs}"


def test_invalid_kvs():
    for data, want in INVALID:
        got, errs = decode(data)
        assert got == want, f"{data!r}: {got}"
        assert errs, f"{data!r}: expected an error"


def test_empty_log():
    got, errs = decode("")
    assert got == {} and errs == ["empty log not expected"]


def test_is_key_walk():
    # TestIsKey (logfmtutils_test.go:9-44)
    word = "a=1 b=1 d="
    word, is_k = _is_key("a", word)
    assert is_k and word == "b=1 d="
    word, is_k = _is_key("b", word)
    assert is_k and word == "d="
    word, is_k = _is_key("d", word)
    assert is_k and word == ""
    word, is_k = _is_key("d", word)
    assert not is_k and word == ""


def test_key_alias_normalization():
    got, _ = decode('time=2023-01-01T00:00:00Z message="hi" err=boom tid=42 usr=bob spanid=7')
    assert got == {"ts": "2023-01-01T00:00:00Z", "msg": "hi", "error": "boom",
                   "traceID": "42", "user": "bob", "spanID": "7"}


def test_duplicate_keys_merge_with_space():
    got, _ = decode("k=a k=b k=c")
    assert got == {"k": "a b c"}


def test_tokenize_regex_matches_scanner_reference():
    # the regex fast path must be BYTE-EQUAL to the character scanner spec
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from logunifier_spark.functions.logfmt import _tokenize, _tokenize_ref

    alphabet = st.sampled_from(list('ab=" \t\r\n\\xyz0'))

    @settings(max_examples=2000, deadline=None)
    @given(st.text(alphabet=alphabet, max_size=40))
    def check(line):
        assert _tokenize(line) == _tokenize_ref(line)

    check()
    # targeted nasties: quotes, escapes, trailing backslash, empty keys
    for line in ['k="a\\"', 'k="a\\', 'k="ab\\\\"', '="v"', 'a=b"c',
                 '"bare" x=1', 'k="multi\nline" y', 'a=b=c d', 'k=""',
                 'k=" " ts=1 "', "\\", 'x=\\n']:
        assert _tokenize(line) == _tokenize_ref(line), line
