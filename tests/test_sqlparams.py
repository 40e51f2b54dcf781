"""${param} substitution (reference semantics: Common.scala:151-160,
including the optional ``=default`` arm). Pure-python — no Spark."""

from arc_jupyter_spark.plans.sqlparams import inject_parameters, unresolved_parameters


def test_basic_substitution():
    assert inject_parameters("SELECT ${a}", {"a": "1"}) == "SELECT 1"


def test_whitespace_tolerant():
    assert inject_parameters("SELECT ${ a }", {"a": "1"}) == "SELECT 1"


def test_default_used_when_absent():
    assert inject_parameters("SELECT ${a=42}", {}) == "SELECT 42"


def test_value_beats_default():
    assert inject_parameters("SELECT ${a=42}", {"a": "7"}) == "SELECT 7"


def test_unresolved_left_intact():
    assert inject_parameters("SELECT ${missing}", {}) == "SELECT ${missing}"


def test_unresolved_reporting():
    sql = "SELECT ${a}, ${b=1}, ${c}"
    assert unresolved_parameters(sql, {"a": "x"}) == ["c"]


def test_multiple_occurrences():
    assert inject_parameters("${x} + ${x}", {"x": "2"}) == "2 + 2"
