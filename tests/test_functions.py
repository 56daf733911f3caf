"""GREL/IdLab function registry unit tests (semantics per the reference's
pyrml/functions.py, bugs excluded per SURVEY.md §7)."""

import pytest
from pyspark.sql import functions as F

from pyrml_spark.terms import const_lit
from pyrml_spark.functions.registry import (
    GREL,
    IDLAB,
    STLAB,
    WHO,
    default_registry,
    strptime_to_java,
)

VP = GREL + "valueParameter"
VP2 = GREL + "valueParameter2"
SUB = GREL + "string_sub"
SEP = GREL + "p_string_sep"
ARR = GREL + "p_array_a"
NUM = GREL + "p_dec_n"


@pytest.fixture(scope="module")
def reg():
    return default_registry()


def run1(spark, col_expr):
    return spark.range(1).select(col_expr.alias("v")).collect()[0]["v"]


def build(reg, fun, *args):
    return reg.get(fun).build(list(args))


def test_string_functions(spark, reg):
    assert run1(spark, build(reg, GREL + "toLowerCase", (VP, F.lit("AbC")))) == "abc"
    assert run1(spark, build(reg, GREL + "toUpperCase", (VP, F.lit("AbC")))) == "ABC"
    assert run1(spark, build(reg, GREL + "string_trim", (VP, F.lit("  x ")))) == "x"
    assert run1(spark, build(reg, GREL + "string_toTitlecase",
                             (VP, F.lit("mcDonald and sons")))) == "McDonald And Sons"
    assert run1(spark, build(reg, GREL + "string_length", (VP, F.lit("abcd")))) == 4
    assert run1(spark, build(reg, GREL + "string_contains",
                             (VP, F.lit("hello")), (SUB, F.lit("ell")))) is True
    assert run1(spark, build(reg, GREL + "string_replace",
                             (VP, F.lit("a-b-c")),
                             (GREL + "p_string_find", F.lit("-")),
                             (GREL + "p_string_replace", F.lit("+")))) == "a+b+c"
    assert run1(spark, build(reg, GREL + "string_endsWith",
                             (VP, F.lit("hello")), (SUB, F.lit("lo")))) is True
    assert run1(spark, build(reg, GREL + "string_indexOf",
                             (VP, F.lit("hello")), (SUB, F.lit("l")))) == 2
    assert run1(spark, build(reg, GREL + "string_indexOf",
                             (VP, F.lit("hello")), (SUB, F.lit("z")))) == -1
    assert run1(spark, build(reg, GREL + "string_lastIndexOf",
                             (VP, F.lit("hello")), (SUB, F.lit("l")))) == 3
    assert run1(spark, build(reg, GREL + "string_lastIndexOf",
                             (VP, F.lit("hello")), (SUB, F.lit("z")))) == -1
    # correct GREL slice [from:to) — NOT the reference's reversed bug
    assert run1(spark, build(reg, GREL + "string_substring",
                             (VP, F.lit("abcdef")),
                             (GREL + "p_int_i_from", F.lit(1)),
                             (GREL + "p_int_i_opt_to", F.lit(4)))) == "bcd"
    assert run1(spark, build(reg, GREL + "string_chomp",
                             (VP, F.lit("a\nb\n")), (SEP, F.lit("")))) == "ab"
    assert run1(spark, build(reg, IDLAB + "concat",
                             (IDLAB + "str", F.lit("a")),
                             (IDLAB + "otherStr", F.lit("b")),
                             (IDLAB + "delimiter", F.lit("-")))) == "a-b"
    assert run1(spark, build(reg, IDLAB + "slugify",
                             (IDLAB + "str", F.lit("Hello, World! 42")))) \
        == "hello-world-42"
    assert run1(spark, build(reg, WHO + "local_name",
                             (WHO + "value", F.lit("http://x.org/a/Name")))) == "Name"
    assert run1(spark, build(reg, WHO + "local_name",
                             (WHO + "value", F.lit("http://x.org/a#Frag")))) == "Frag"


def test_numeric_and_bool_functions(spark, reg):
    assert run1(spark, build(reg, GREL + "string_toNumber",
                             (GREL + "p_any_e", F.lit("2.5")))) == 2.5
    assert run1(spark, build(reg, GREL + "math_min",
                             (NUM, F.lit("3")), (GREL + "param_n2", F.lit("7")))) == 3.0
    assert run1(spark, build(reg, GREL + "math_max",
                             (NUM, F.lit("3")), (GREL + "param_n2", F.lit("7")))) == 7.0
    assert run1(spark, build(reg, GREL + "math_floor", (NUM, F.lit("2.7")))) == 2
    assert run1(spark, build(reg, GREL + "math_ceil", (NUM, F.lit("2.2")))) == 3
    assert run1(spark, build(reg, GREL + "math_log", (NUM, F.lit("1000")))) == 3.0
    assert run1(spark, build(reg, IDLAB + "equal",
                             (VP, F.lit("a")), (VP2, F.lit("a")))) is True
    assert run1(spark, build(reg, IDLAB + "notEqual",
                             (VP, F.lit("a")), (VP2, F.lit("b")))) is True
    # numeric inRange [from, to) — NOT the reference's int-only range() bug
    assert run1(spark, build(reg, IDLAB + "inRange",
                             (IDLAB + "p_test", F.lit("2.5")),
                             (IDLAB + "p_from", F.lit("2")),
                             (IDLAB + "p_to", F.lit("3")))) is True
    assert run1(spark, build(reg, GREL + "boolean_not",
                             (GREL + "bool_b", F.lit("true")))) is False
    assert run1(spark, build(reg, GREL + "controls_if",
                             (GREL + "bool_b", F.lit("true")),
                             (GREL + "any_true", F.lit("yes")),
                             (GREL + "any_false", F.lit("no")))) == "yes"
    assert run1(spark, build(reg, GREL + "boolean_and",
                             (GREL + "param_rep_b", F.lit("true")),
                             (GREL + "param_rep_b", F.lit("false")))) is False
    assert run1(spark, build(reg, GREL + "boolean_or",
                             (GREL + "param_rep_b", F.lit("true")),
                             (GREL + "param_rep_b", F.lit("false")))) is True


def test_array_functions(spark, reg):
    arr = F.array(F.lit("a"), F.lit("b"), F.lit("c"))
    assert run1(spark, build(reg, GREL + "array_length", (ARR, arr))) == 3
    assert run1(spark, build(reg, GREL + "array_reverse", (ARR, arr))) == ["c", "b", "a"]
    assert run1(spark, build(reg, GREL + "array_join",
                             (ARR, arr), (SEP, const_lit("-")))) == "a-b-c"
    assert run1(spark, build(reg, GREL + "array_slice",
                             (ARR, arr),
                             (GREL + "param_int_i_from", F.lit(1)),
                             (GREL + "param_int_i_opt_to", F.lit(3)))) == ["b", "c"]
    nums = F.array(F.lit("1"), F.lit("2"), F.lit("3"))
    assert run1(spark, build(reg, GREL + "array_sum", (ARR, nums))) == 6.0
    assert run1(spark, build(reg, GREL + "string_split",
                             (VP, F.lit("a b c")), (SEP, const_lit(" ")))) == ["a", "b", "c"]
    assert run1(spark, build(reg, GREL + "listContainsElement",
                             (IDLAB + "list", arr),
                             (IDLAB + "str", F.lit("b")))) is True


def test_hash_and_date_functions(spark, reg):
    assert run1(spark, build(reg, GREL + "string_md5", (VP, F.lit("abc")))) \
        == "900150983cd24fb0d6963f7d28e17f72"
    assert run1(spark, build(reg, GREL + "string_sha1", (VP, F.lit("abc")))) \
        == "a9993e364706816aba3e25717850c26c9cd0d89d"
    # single-letter java tokens parse 1- and 2-digit values (Python %d semantics)
    assert strptime_to_java("%d/%m/%Y %H:%M") == "d/M/yyyy H:m"
    assert run1(spark, build(reg, IDLAB + "normalizeDate",
                             (IDLAB + "strDate", F.lit("23/12/1919")),
                             (IDLAB + "pattern", const_lit("%d/%m/%Y")))) == "1919-12-23"
    assert run1(spark, build(reg, IDLAB + "normalizeDateTime",
                             (IDLAB + "strDate", F.lit("23/12/1919 10:30")),
                             (IDLAB + "pattern", const_lit("%d/%m/%Y %H:%M")))) \
        == "1919-12-23T10:30:00"
    # separator-less pattern (%Y%m%d): the flexible 'yyyyMd' translation
    # parses greedily and returns NULL — the fixed-width coalesce fallback
    # must recover Python strptime's behavior (ADVICE r2 medium item)
    assert run1(spark, build(reg, IDLAB + "normalizeDate",
                             (IDLAB + "strDate", F.lit("20200102")),
                             (IDLAB + "pattern", const_lit("%Y%m%d")))) == "2020-01-02"
    assert run1(spark, build(reg, IDLAB + "normalizeDateTime",
                             (IDLAB + "strDate", F.lit("19191223 1030")),
                             (IDLAB + "pattern", const_lit("%Y%m%d %H%M")))) \
        == "1919-12-23T10:30:00"
    # literal letters in the pattern must be quoted for java.time — an
    # unquoted ISO 'T' (or connectives like 'de') is a reserved pattern
    # letter and used to throw before the r6 tokenizing translation
    assert strptime_to_java("%Y-%m-%dT%H:%M:%S") == "yyyy-M-d'T'H:m:s"
    assert run1(spark, build(
        reg, IDLAB + "normalizeDateTime",
        (IDLAB + "strDate", F.lit("2020-01-02T10:30:00")),
        (IDLAB + "pattern", const_lit("%Y-%m-%dT%H:%M:%S")))) \
        == "2020-01-02T10:30:00"


def test_short_uuid_matches_published_algorithm(spark, reg):
    """shortuuid.uuid('test') base57 prefix — public algorithm
    (uuid5(NAMESPACE_DNS, name) → base57, alphabet without 0O1Il)."""
    import uuid as _uuid

    alphabet = "23456789ABCDEFGHJKLMNPQRSTUVWXYZabcdefghijkmnopqrstuvwxyz"
    number = _uuid.uuid5(_uuid.NAMESPACE_DNS, "test").int
    digits = []
    while number:
        number, d = divmod(number, 57)
        digits.append(alphabet[d])
    expected = "".join(digits[::-1]).rjust(22, alphabet[0])[:8]
    got = run1(spark, build(reg, STLAB + "short_uuid",
                            (STLAB + "in_string", F.lit("test"))))
    assert got == expected


def test_true_condition_null_drops(spark, reg):
    assert run1(spark, build(reg, IDLAB + "trueCondition",
                             (IDLAB + "strBoolean", F.lit("false")),
                             (IDLAB + "str", F.lit("x")))) is None
    assert run1(spark, build(reg, IDLAB + "trueCondition",
                             (IDLAB + "strBoolean", F.lit("true")),
                             (IDLAB + "str", F.lit("x")))) == "x"


def test_coalesce_and_isnull(spark, reg):
    assert run1(spark, build(reg, GREL + "other_coalesce",
                             (GREL + "p_any_rep_e", F.lit(None).cast("string")),
                             (GREL + "p_any_rep_e", F.lit("b")))) == "b"
    assert run1(spark, build(reg, IDLAB + "isNull",
                             (IDLAB + "str", F.lit(None).cast("string")))) is True
    assert run1(spark, build(reg, IDLAB + "isNull",
                             (IDLAB + "str", F.lit("x")))) is False


def test_normalize_date_with_lang_locales(spark, reg):
    """Non-English locales (round-1 gap): month/day names translated to
    numeric fields JVM-side — reference semantics (functions.py:119-148)
    without its process-global locale mutation."""
    IDLAB_ = "http://example.com/idlab/function/"
    cases = [
        ("23 dicembre 1919", "%d %B %Y", "it_IT", "1919-12-23"),
        ("06 décembre 1929", "%d %B %Y", "fr_FR", "1929-12-06"),
        ("3. Oktober 1990", "%d. %B %Y", "de_DE", "1990-10-03"),
        ("12 ago 2001", "%d %b %Y", "es_ES", "2001-08-12"),
        ("sábado 12 agosto 2001", "%A %d %B %Y", "es", "2001-08-12"),
        ("23/12/1919", "%d/%m/%Y", "en_US", "1919-12-23"),
        # weekday abbr == month abbr (es 'mar' = martes AND marzo): the
        # weekday strip must take only the FIRST occurrence (ADVICE r2)
        ("mar. 3 mar. 2020", "%a %d %b %Y", "es", "2020-03-03"),
        # trailing-weekday format: the strip must take the LAST occurrence
        # (anchored by the %a position in fmt — ADVICE r3), else the month
        # token is eaten instead
        ("3 mar. 2020 mar.", "%d %b %Y %a", "es", "2020-03-03"),
        # weekday-absent input under a weekday format with NON-colliding
        # names parses leniently (no field to strip, month still replaced);
        # the colliding weekday-absent case ('3 mar. 2020' + '%d %b %Y %a')
        # is ambiguous and NULLs, like strict strptime would
        ("3 ene. 2020", "%d %b %Y %a", "es", "2020-01-03"),
        ("3 mar. 2020", "%d %b %Y %a", "es", None),
        # accented final letters need unicode word boundaries ((?U))
        ("lunedì 5 ottobre 2020", "%A %d %B %Y", "it", "2020-10-05"),
        # new locales: genitive month forms (ru/pl), sv, locale day abbrs
        ("3 января 2020", "%d %B %Y", "ru_RU", "2020-01-03"),
        ("март 2021 15", "%B %Y %d", "ru", "2021-03-15"),
        ("12 października 2019", "%d %B %Y", "pl_PL", "2019-10-12"),
        # r4 locales: da / fi (partitive) / cs (genitive) / tr
        ("3. marts 2020", "%d. %B %Y", "da_DK", "2020-03-03"),
        ("3. tammikuuta 2020", "%d. %B %Y", "fi_FI", "2020-01-03"),
        ("15. září 2021", "%d. %B %Y", "cs_CZ", "2021-09-15"),
        ("12 ağustos 2001", "%d %B %Y", "tr_TR", "2001-08-12"),
        ("cum 12 eyl. 2014", "%a %d %b %Y", "tr", "2014-09-12"),
        ("pon 7 maj 2018", "%a %d %b %Y", "pl", "2018-05-07"),
        ("måndag 5 augusti 2020", "%A %d %B %Y", "sv_SE", "2020-08-05"),
        # r5 locales: el (genitive) + CJK (ja/zh/ko: no word boundaries —
        # Java (?U)\b sees ideographs as word chars)
        ("3 Ιανουαρίου 2020", "%d %B %Y", "el_GR", "2020-01-03"),
        ("δευ 5 οκτ 2020", "%a %d %b %Y", "el", "2020-10-05"),
        ("2020年1月3日", "%Y年%m月%d日", "ja_JP", "2020-01-03"),
        ("2020年1月3日", "%Y年%B%d日", "ja", "2020-01-03"),
        # day-abbr ⊂ month marker (ja '月' in '1月', ko '월' in '1월'):
        # the single-alternation LAST-occurrence strip must not eat the
        # month token — both the colliding and non-colliding weekdays
        ("2020年1月3日 月", "%Y年%m月%d日 %a", "ja", "2020-01-03"),
        ("2020年1月3日 火", "%Y年%m月%d日 %a", "ja", "2020-01-03"),
        ("2020 三月 15", "%Y %B %d", "zh_CN", "2020-03-15"),
        ("2020年3月15日 星期日", "%Y年%m月%d日 %A", "zh", "2020-03-15"),
        ("2020년 1월 3일", "%Y년 %m월 %d일", "ko_KR", "2020-01-03"),
        ("1월 3, 2020", "%B %d, %Y", "ko", "2020-01-03"),
        ("2020년 1월 3일 월", "%Y년 %m월 %d일 %a", "ko", "2020-01-03"),
        # r6 locales: uk (genitive/nominative variants), ro, hu, nb/no/nn
        # (shared table, both weekday sets), ca, id, ar (two Gregorian
        # naming systems as variants; Arabic letters are (?U)\b word chars)
        ("3 січня 2020", "%d %B %Y", "uk_UA", "2020-01-03"),
        ("листопад 2021 15", "%B %Y %d", "uk", "2021-11-15"),
        ("3 ianuarie 2020", "%d %B %Y", "ro_RO", "2020-01-03"),
        ("vineri 12 sept. 2014", "%A %d %b %Y", "ro", "2014-09-12"),
        ("2020. január 3.", "%Y. %B %d.", "hu_HU", "2020-01-03"),
        ("3. januar 2020", "%d. %B %Y", "nb_NO", "2020-01-03"),
        ("laurdag 5. desember 2020", "%A %d. %B %Y", "nn", "2020-12-05"),
        ("mandag 5. des. 2020", "%A %d. %b %Y", "no", "2020-12-05"),
        ("5 de març 2021", "%d de %B %Y", "ca_ES", "2021-03-05"),
        ("12 Agustus 2001", "%d %B %Y", "id_ID", "2001-08-12"),
        ("Jumat 12 Agu 2014", "%A %d %b %Y", "id", "2014-08-12"),
        ("3 يناير 2020", "%d %B %Y", "ar_EG", "2020-01-03"),
        ("3 كانون الثاني 2020", "%d %B %Y", "ar_SY", "2020-01-03"),
        ("الجمعة 12 سبتمبر 2014", "%A %d %B %Y", "ar", "2014-09-12"),
        # r6 tier 2: cs/hr/fi inflected variants, he/hi RTL+Devanagari
        # boundaries, vi numbered months, bg with a literal 'г.' suffix
        # (exercises the literal-text quoting in strptime_to_java)
        ("3. ledna 2020", "%d. %B %Y", "cs_CZ", "2020-01-03"),
        ("pátek 3. čvc 2020", "%A %d. %b %Y", "cs", "2020-07-03"),
        ("3. januar 2020", "%d. %B %Y", "da_DK", "2020-01-03"),
        ("søndag den 5. december 2021", "%A den %d. %B %Y", "da",
         "2021-12-05"),
        ("3. tammikuuta 2020", "%d. %B %Y", "fi_FI", "2020-01-03"),
        ("maaliskuu 2021", "%B %Y", "fi", "2021-03-01"),
        ("3 януари 2020 г.", "%d %B %Y г.", "bg_BG", "2020-01-03"),
        ("3. siječnja 2020.", "%d. %B %Y.", "hr_HR", "2020-01-03"),
        ("studeni 2021 15", "%B %Y %d", "hr", "2021-11-15"),
        ("3 ינואר 2020", "%d %B %Y", "he_IL", "2020-01-03"),
        ("3 जनवरी 2020", "%d %B %Y", "hi_IN", "2020-01-03"),
        ("सोमवार 12 नवंबर 2018", "%A %d %B %Y", "hi", "2018-11-12"),
        ("ngày 3 tháng 1 năm 2020", "ngày %d %B năm %Y", "vi_VN",
         "2020-01-03"),
        ("3 tháng 11 2020", "%d %B %Y", "vi", "2020-11-03"),
        # r6 tier 3: sl/et plain, lv locative + 'gada' literal, lt
        # genitive with literal 'm.'/'d.' era markers
        ("3. marec 2020", "%d. %B %Y", "sl_SI", "2020-03-03"),
        ("3. jaanuar 2020", "%d. %B %Y", "et_EE", "2020-01-03"),
        ("2020. gada 3. janvārī", "%Y. gada %d. %B", "lv_LV",
         "2020-01-03"),
        ("marts 2021 15", "%B %Y %d", "lv", "2021-03-15"),
        ("2020 m. sausio 3 d.", "%Y m. %B %d d.", "lt_LT", "2020-01-03"),
        ("gruodis 2021 5", "%B %Y %d", "lt", "2021-12-05"),
        # %a abbreviations that a [:3]-of-full-name fallback would get
        # wrong (code-review r6): explicit CLDR days_abbr tables
        ("Th 6 12 tháng 9 2014", "%a %d %B %Y", "vi", "2014-09-12"),
        ("pe 12. syyskuuta 2014", "%a %d. %B %Y", "fi", "2014-09-12"),
        ("R 12. september 2014", "%a %d. %B %Y", "et", "2014-09-12"),
        ("piektd. 12. septembrī 2014", "%a %d. %B %Y", "lv",
         "2014-09-12"),
        ("الجمعة 12 سبتمبر 2014", "%a %d %B %Y", "ar", "2014-09-12"),
        # r7 tier: sk genitive, sr in BOTH orthographies (one table),
        # th full month names (Gregorian year; BE rescale is the
        # caller's semantic, see the table comment)
        ("3. marca 2020", "%d. %B %Y", "sk_SK", "2020-03-03"),
        ("piatok 12. septembra 2014", "%A %d. %B %Y", "sk", "2014-09-12"),
        ("3. јануара 2020.", "%d. %B %Y.", "sr_RS", "2020-01-03"),
        ("3. januara 2020.", "%d. %B %Y.", "sr", "2020-01-03"),
        ("петак 12. децембар 2014", "%A %d. %B %Y", "sr", "2014-12-12"),
        ("12 กันยายน 2014", "%d %B %Y", "th_TH", "2014-09-12"),
        ("วันศุกร์ 12 กันยายน 2014", "%A %d %B %Y", "th", "2014-09-12"),
    ]
    for value, fmt, lang, expect in cases:
        got = run1(spark, build(
            reg, IDLAB_ + "normalizeDateWithLang",
            (IDLAB_ + "strDate", F.lit(value)),
            (IDLAB_ + "pattern", const_lit(fmt)),
            (IDLAB_ + "lang", const_lit(lang)),
        ))
        assert got == expect, (value, lang, got)
    got = run1(spark, build(
        reg, IDLAB_ + "normalizeDateTimeWithLang",
        (IDLAB_ + "strDate", "23 dicembre 1919 10:30"
         and F.lit("23 dicembre 1919 10:30")),
        (IDLAB_ + "pattern", const_lit("%d %B %Y %H:%M")),
        (IDLAB_ + "lang", const_lit("it")),
    ))
    assert got == "1919-12-23T10:30:00", got

    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        build(reg, IDLAB_ + "normalizeDateWithLang",
              (IDLAB_ + "strDate", F.lit("x")),
              (IDLAB_ + "pattern", const_lit("%d %B %Y")),
              (IDLAB_ + "lang", const_lit("sw_KE")))  # beyond the 38 keys


def test_strptime_unknown_directive_raises():
    """'%' + unknown letter raises (ADVICE r6) — Python strptime rejects
    unsupported directives, so silently quoting '%e' as literal text
    would be a silent mis-parse."""
    import pytest

    for bad in ["%e", "%d %e %Y", "%Q"]:
        with pytest.raises(ValueError, match="unsupported strptime"):
            strptime_to_java(bad)
    # lone '%' before a non-letter / at end stays a literal
    assert strptime_to_java("%d%%5%") == "d%5%"
