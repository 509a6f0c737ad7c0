"""The compat layer mirrors the reference import surface 1:1."""


def test_compat_surface():
    from yargy_ray.compat import (  # noqa: F401
        Parser, and_, empty, forward, not_, or_, rule,
    )
    from yargy_ray.compat.predicates import (  # noqa: F401
        caseless, custom, dictionary, eq, gram, gte, in_, in_caseless,
        is_capitalized, is_lower, is_single, is_title, is_upper,
        length_eq, lte, normalized, tag, true, type,
    )
    from yargy_ray.compat.interpretation import (  # noqa: F401
        attribute, const, fact, inflected,
    )
    from yargy_ray.compat.pipelines import (  # noqa: F401
        caseless_pipeline, morph_pipeline, pipeline,
    )
    from yargy_ray.compat.relations import gnc_relation, main  # noqa: F401
    from yargy_ray.compat.tagger import PassTagger, Tagger  # noqa: F401
    from yargy_ray.compat.tokenizer import (  # noqa: F401
        EMAIL_RULE, PHONE_RULE, MorphTokenizer, Tokenizer,
    )


def test_compat_person_pipeline():
    """The README Person grammar built from compat imports only."""
    from yargy_ray.compat import Parser, and_, rule
    from yargy_ray.compat.interpretation import fact
    from yargy_ray.compat.predicates import gram
    from yargy_ray.compat.relations import gnc_relation

    Person = fact('Person', ['first', 'last'])
    gnc = gnc_relation()
    FIRST = and_(gram('Name')).interpretation(
        Person.first.inflected()).match(gnc)
    LAST = and_(gram('Surn')).interpretation(
        Person.last.inflected()).match(gnc)
    parser = Parser(rule(FIRST, LAST).interpretation(Person))
    match = parser.match('сашу иванову')
    assert match.fact.as_json == {'first': 'саша', 'last': 'иванова'}
