"""TextToCountries (J6 gazetteer join) tests."""

import pandas as pd

from trainable_entity_extractor_spark.domain import ExtractionContext, ExtractionIdentifier, Option
from trainable_entity_extractor_spark.functions.countries import find_countries
from trainable_entity_extractor_spark.methods.text_to_multi_option import TextToCountries


def test_find_countries_variants_and_order():
    text = "Delegations from the Russian Federation, Viet Nam and the USA spoke."
    assert find_countries(text) == ["Russia", "Vietnam", "United States"]
    assert find_countries("nothing here") == []
    # word boundaries: 'Iran' should not fire inside 'Irandust'
    assert find_countries("Mr. Irandust attended") == []


def make_ctx(tmp_path, options, multi=True):
    return ExtractionContext(
        identifier=ExtractionIdentifier("cty", output_path=str(tmp_path)),
        options=options,
        multi_value=multi,
    )


def test_can_be_used_gate(tmp_path):
    method = TextToCountries()
    country_opts = [Option("1", "France"), Option("2", "Germany"), Option("3", "not a place")]
    assert method.can_be_used(pd.DataFrame(), make_ctx(tmp_path, country_opts))
    non_country = [Option("1", "apple"), Option("2", "banana"), Option("3", "Spain")]
    assert not method.can_be_used(pd.DataFrame(), make_ctx(tmp_path, non_country))


def test_predict_countries_and_fallback_keywords(tmp_path):
    options = [
        Option("1", "Republic of France"),
        Option("2", "Germany"),
        Option("3", "special category"),
    ]
    ctx = make_ctx(tmp_path, options)
    method = TextToCountries()
    artifact = method.fit(pd.DataFrame(), ctx)
    pdf = pd.DataFrame(
        [
            {"entity_name": "a", "source_text": "submitted by France and the special category desk"},
            {"entity_name": "b", "source_text": "Germany only"},
        ]
    )
    preds = method.predict_pandas(pdf, ctx, artifact)
    assert [v["id"] for v in preds.iloc[0]] == ["1", "3"]
    assert [v["id"] for v in preds.iloc[1]] == ["2"]
