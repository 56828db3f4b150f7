

def test_expr_repr_renders_code():
    from patito_ray.exprs import col, expr_to_str

    e = (col("price") > 0) & ~col("lang").is_in(["en"])
    s = repr(e)
    assert s == "<Expr: ((col('price') > lit(0)) & ~col('lang').is_in(['en']))>"
    f = col("url").str.contains("^https", True).cast("bool")
    assert ".str.contains('^https', True)" in expr_to_str(f.node)
    assert ".cast('bool')" in expr_to_str(f.node)


def test_field_repr_shows_set_kwargs():
    from patito_ray.fields import Field

    s = repr(Field(unique=True, ge=1, le=9))
    assert s.startswith("Field(") and "unique=True" in s
    assert "minimum=1" in s or "ge=1" in s
