"""Parser unit tests (reference model: tests/test__parser__parse.py)."""

from framequery_spark.parser import ast, parse
from framequery_spark.parser.tokenizer import tokenize


def test_tokenize_basics():
    toks = [t.value for t in tokenize("SELECT a, 1.5e3 FROM t -- comment\nWHERE x<>'it''s'")]
    assert toks == ["SELECT", "a", ",", "1.5e3", "FROM", "t", "WHERE", "x", "<>", "'it''s'"]


def test_simple_select():
    node = parse("select a, b as c from t")
    assert isinstance(node, ast.Select)
    assert node.items[0] == ast.SelectItem(expr=ast.ColumnRef(parts=("a",)), alias=None)
    assert node.items[1].alias == "c"
    assert node.from_ == ast.TableRef(parts=("t",), alias=None)


def test_precedence_power_vs_mul():
    node = parse("select 2 * 3 ^ 2")
    expr = node.items[0].expr
    assert expr.op == "*"
    assert expr.right.op == "^"


def test_unary_minus_folds_literal():
    node = parse("select -5")
    assert node.items[0].expr == ast.Literal(-5, "int")


def test_case_simple_desugars():
    node = parse("select case a when 1 then 'x' end from t")
    case = node.items[0].expr
    assert isinstance(case, ast.Case)
    cond = case.whens[0][0]
    assert cond == ast.Binary(op="=", left=ast.ColumnRef(parts=("a",)),
                              right=ast.Literal(1, "int"))


def test_join_chain_kinds():
    node = parse("select * from a join b on a.x=b.x left join c on b.y=c.y")
    j = node.from_
    assert j.kind == "left"
    assert j.left.kind == "inner"


def test_comma_join_is_cross():
    node = parse("select * from a, b")
    assert node.from_.kind == "cross"


def test_group_order_limit():
    node = parse("select a, count(*) from t group by 1 order by 2 desc limit 3 offset 1")
    assert node.group_by == (ast.Literal(1, "int"),)
    assert node.order_by[0].ascending is False
    assert node.limit == ast.Literal(3, "int")
    assert node.offset == ast.Literal(1, "int")


def test_order_by_default_asc():
    # deliberate deviation from the reference's desc default (SURVEY §2.6)
    node = parse("select a from t order by a")
    assert node.order_by[0].ascending is True


def test_window_call():
    node = parse("select sum(x) over (partition by a order by b rows between unbounded preceding and current row) from t")
    w = node.items[0].expr
    assert isinstance(w, ast.WindowCall)
    assert w.spec.frame_type == "rows"
    assert w.spec.frame_start.kind == "unbounded_preceding"


def test_cast_forms():
    node = parse("select cast(a as varchar), b::json from t")
    assert node.items[0].expr == ast.Cast(expr=ast.ColumnRef(parts=("a",)), type_name="varchar")
    assert node.items[1].expr.type_name == "json"


def test_statements():
    assert isinstance(parse("copy t from 'f.csv' with (delimiter ';')"), ast.CopyFrom)
    assert isinstance(parse("copy t to 'f.csv'"), ast.CopyTo)
    assert isinstance(parse("create table x as select 1"), ast.CreateTableAs)
    assert parse("drop table a, b").names == ("a", "b")
    assert parse("show transaction isolation level").option == "transaction isolation level"


def test_set_ops():
    node = parse("select 1 union all select 2 union select 3")
    assert node.op == "union"
    assert node.left.op == "union all"


def test_cte():
    node = parse("with a as (select 1 as x), b as (select 2 as y) select * from a, b")
    assert [c.name for c in node.ctes] == ["a", "b"]


def test_quoted_identifiers_preserved():
    node = parse('select "MiXeD" from "My Table"')
    assert node.items[0].expr.parts == ("MiXeD",)
    assert node.from_.parts == ("My Table",)


def test_like_ilike_not():
    node = parse("select * from t where a like 'x%' and b not ilike '_y'")
    conj = node.where
    assert conj.right.negated and conj.right.case_insensitive


def test_lateral_parses():
    node = parse("select * from t, lateral json_each(t.payload) as kv")
    assert node.from_.right.lateral is True
    assert node.from_.right.name == "json_each"


def test_tsql_negated_comparisons_normalize():
    # !> ("not greater") == <=, !< ("not less") == >=
    node = parse("select * from t where a !> 3 and b !< 1")
    conj = node.where
    assert conj.left.op == "<="
    assert conj.right.op == ">="


def test_asof_join_parses_and_alias_not_eaten():
    node = parse("select * from l asof left join r on l.k = r.k and l.ts > r.ts")
    assert node.from_.kind == "asof_left"
    node = parse("select * from l asof join r on l.k = r.k and l.ts >= r.ts")
    assert node.from_.kind == "asof_inner"
    # 'asof' still works as an ordinary implicit alias
    node = parse("select asof.x from t asof")
    assert node.from_.alias == "asof"


def test_top_level_values_statement():
    node = parse("values (1, 'a'), (2, 'b')")
    assert node.from_.rows and len(node.from_.rows) == 2


def test_parser_fuzz_raises_only_parse_errors():
    # robustness: arbitrary garbage must fail with ParseError/TokenizeError,
    # never an internal exception
    import itertools
    import random

    from framequery_spark.parser.parser import ParseError
    from framequery_spark.parser.tokenizer import TokenizeError

    rnd = random.Random(7)
    atoms = ["select", "from", "(", ")", "*", ",", "'x'", "1", "a", "+",
             "where", "group", "by", "order", "join", "on", "::", "[", "]",
             "case", "when", "end", "asof", "lateral", "->", "!>", "%", ";"]
    for i in range(400):
        q = " ".join(rnd.choice(atoms) for _ in range(rnd.randrange(1, 12)))
        try:
            parse(q)
        except (ParseError, TokenizeError):
            pass  # expected failure mode


def test_select_into_only_at_top_level():
    # pg rejects SELECT INTO in subqueries AND in queries nested under
    # INSERT / CREATE TABLE AS (whose parse_query calls also start at
    # depth 1 — the stashed INTO target must never silently vanish)
    import pytest

    from framequery_spark.parser.parser import ParseError

    node = parse("select 1 as a into u")
    assert type(node).__name__ == "CreateTableAs" and node.name == "u"
    for sql in ["insert into t select 1 into u",
                "create table x as select 1 into u",
                "select * from (select 1 into u) z",
                "with c as (select 1 into u) select * from c"]:
        with pytest.raises(ParseError, match="top level"):
            parse(sql)


def test_returning_stops_alias_parsing():
    node = parse("insert into t select a from s returning a")
    assert node.returning
    assert node.query.from_.alias is None


def test_parse_subgrammar_entry_points():
    """r12: parse(sql, what=...) sub-grammar dispatch (reference
    parser/_parser.py:20-44 — its constructors dict of sub-parsers)."""
    import pytest

    from framequery_spark.parser import ParseError, ast, parse

    e = parse("a + 1", what="expr")
    assert isinstance(e, ast.Binary) and e.op == "+"
    t = parse("public.test as foo", what="table_ref")
    assert isinstance(t, ast.TableRef)
    assert t.parts == ("public", "test") and t.alias == "foo"
    f = parse("from t1, t2 x", what="from")
    assert isinstance(f, ast.Join) and f.kind == "cross"
    c = parse("min(foo)", what="call")
    assert isinstance(c, ast.Call) and c.name == "min"
    s = parse("select 1", what="select")
    assert isinstance(s, ast.Select)
    assert isinstance(parse("order by a desc", what="order_by"), tuple)
    with pytest.raises(ParseError, match="unknown sub-grammar"):
        parse("x", what="nope")
    with pytest.raises(ParseError):
        parse("a + 1 extra junk", what="expr")


def test_uescape_identifiers():
    """r12: U&"..." unicode-escaped identifiers (+UESCAPE), the
    identifier twin of the U&'...' string form."""
    import pytest

    from framequery_spark.parser import parse
    from framequery_spark.parser.tokenizer import TokenizeError

    assert parse(r'select a AS U&"d\0061t\0061" from t') \
        .items[0].alias == "data"
    assert parse("select a AS U&\"d!0061ta\" UESCAPE '!' from t") \
        .items[0].alias == "data"
    ref = parse(r'select U&"col\0031" from t').items[0].expr
    assert ref.parts == ("col1",) and ref.quoted
    with pytest.raises(TokenizeError, match="invalid U& identifier"):
        parse(r'select U&"bad\00" from t')
