"""HTML backend golden tests — mirror the reference's blaze doctest tables
(/root/reference/blaze-colonnade/src/Text/Blaze/Colonnade.hs:73-250: the
employees Name/Age table) and the lucid setColspanOrHide / sectioned
behaviors (lucid-colonnade/src/Lucid/Colonnade.hs:228-231, 269-292)."""

import pytest

EMPLOYEES = [("Thaddeus", 34, "Sales"),
             ("Lucia", 33, "Engineering"),
             ("Pranav", 57, "Management")]


@pytest.fixture(scope="module")
def employees(spark):
    return spark.createDataFrame(EMPLOYEES, "Name string, Age int, Dept string")


def test_html_table_golden(employees):
    from colonnade_spark.html import html_table

    got = html_table(employees.select("Name", "Age"),
                     table_attrs='class="stylish-table" id="main-table"')
    expected = """\
<table class="stylish-table" id="main-table">
    <thead>
        <tr>
            <th>Name</th>
            <th>Age</th>
        </tr>
    </thead>
    <tbody>
        <tr>
            <td>Thaddeus</td>
            <td>34</td>
        </tr>
        <tr>
            <td>Lucia</td>
            <td>33</td>
        </tr>
        <tr>
            <td>Pranav</td>
            <td>57</td>
        </tr>
    </tbody>
</table>"""
    assert got == expected


def test_html_escaping(spark):
    from colonnade_spark.html import html_table

    df = spark.createDataFrame([('<b>&"x"</b>',)], "c string")
    out = html_table(df)
    assert "&lt;b&gt;&amp;&quot;x&quot;&lt;/b&gt;" in out
    assert "<b>" not in out.replace("<tbody>", "").replace("<table>", "")


def test_html_capped_colspans_and_hide(spark, employees):
    from colonnade_spark.cornice import cap, recap
    from colonnade_spark.html import html_capped
    from colonnade_spark.plan import plan

    ids = plan().headed("Name")
    body = plan().headed("Age").headed("Dept")
    cor = recap("employee", cap("who", ids), cap("facts", body))
    out = html_capped(cor, employees)
    # tier colspans follow the annotation: employee=3, who=1, facts=2
    assert '<th colspan="3">employee</th>' in out
    assert '<th colspan="1">who</th>' in out
    assert '<th colspan="2">facts</th>' in out
    # zero-width column → hidden, not dropped (setColspanOrHide)
    out2 = html_capped(cor, employees, widths={"Dept": 0})
    assert out2.count('style="display:none;"') == 1 + len(EMPLOYEES)
    assert "<td>Sales</td>" not in out2  # the hidden cells carry the style
    assert 'style="display:none;">Sales</td>' in out2


def test_html_definition_table(employees):
    from colonnade_spark.html import html_definition_table

    out = html_definition_table(employees.select("Name", "Age"))
    assert "<th>Name</th>" in out and "<td>Thaddeus</td>" in out
    assert "<th>Age</th>" in out and "<td>34</td>" in out
    # transposed: one tr per column, not per row
    assert out.count("<tr>") == 2


def test_html_sectioned_group_dividers(spark):
    from colonnade_spark.html import html_sectioned

    rows = [("a", 1), ("b", 2), ("a", 3), ("b", 4), ("a", 5)]
    df = spark.createDataFrame(rows, "grp string, v int")
    out = html_sectioned(df, "grp")
    # one divider per distinct adjacent group, spanning all data columns
    assert out.count('<td colspan="1">') == 2
    # group rows are adjacent after their divider
    a_pos = out.index('<td colspan="1">a</td>')
    b_pos = out.index('<td colspan="1">b</td>')
    assert a_pos < out.index("<td>1</td>") < b_pos
    assert b_pos < out.index("<td>2</td>")


def test_html_capped_fascia_and_cell_attrs(spark, employees):
    """Mirrors the blaze fascia doctest (Blaze/Colonnade.hs:338-360):
    FasciaCap "category" (FasciaBase "subcategory") puts one attribute on
    each <thead> tier's <tr>, and the Cell hook (Blaze/Colonnade.hs:263-266)
    puts per-value attributes on the wrapping <td>."""
    from colonnade_spark.cornice import cap
    from colonnade_spark.html import html_capped
    from colonnade_spark.plan import plan

    personal = plan().headed("Name").headed("Age")
    work = plan().headed("Dept")
    cor = cap("Personal", personal) + cap("Work", work)

    def dept_class(col, value):
        return f'class="{str(value).lower()}"' if col == "Dept" else None

    out = html_capped(cor, employees.limit(1),
                      fascia=['class="category"', 'class="subcategory"'],
                      cell_attrs=dept_class)
    assert '<tr class="category">' in out
    assert '<tr class="subcategory">' in out
    assert '<th colspan="2">Personal</th>' in out
    assert '<th colspan="1">Work</th>' in out
    assert '<td class="sales">Sales</td>' in out
    assert "<td>Thaddeus</td>" in out           # unhooked cells stay bare
    # a short fascia leaves the remaining tiers bare
    out2 = html_capped(cor, employees.limit(1), fascia=['class="category"'])
    assert '<tr class="category">' in out2 and '<tr>' in out2
    # cell attrs compose with setColspanOrHide hiding
    out3 = html_capped(cor, employees.limit(1), widths={"Dept": 0},
                       cell_attrs=dept_class)
    assert 'style="display:none;" class="sales">Sales</td>' in out3


def test_html_list_items_and_anchor_cell(employees):
    """yesod encodeListItems (Yesod/Colonnade.hs:99-113) + anchorCell
    (:78-83): one row as a wrapped <li> list, header combined with value;
    anchor_cell renders the body as a link."""
    from colonnade_spark.html import anchor_cell, html_list_items

    out = html_list_items(employees.select("Name", "Age"))
    assert out.startswith("<ul>") and out.endswith("</ul>")
    assert "    <li>Name: Thaddeus</li>" in out
    assert "    <li>Age: 34</li>" in out

    link = anchor_cell(lambda c, v: f"/emp/{v}", lambda c, v: str(v).upper())
    out2 = html_list_items(employees.select("Name"), wrap_tag="ol",
                           render_value=link,
                           cell_attrs=lambda c, v: 'class="who"')
    assert '<li class="who">Name: <a href="/emp/Thaddeus">THADDEUS</a></li>' in out2
    assert out2.startswith("<ol>")
    # escaping holds through the anchor
    assert "&" not in anchor_cell(lambda c, v: "/x?a=1&b=2")("c", "<v>").split(">", 1)[0].replace("&amp;", "")
