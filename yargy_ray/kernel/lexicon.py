"""Embedded deterministic Russian mini-lexicon.

The sandbox has no pymorphy2 and no network, so the morphology backend
ships a small hand-built paradigm table covering the conformance corpus
(FIXTURES.md §3) plus the vocabulary used by the e2e transcript grammars
(months, money units, person names, positions). The pymorphy2 adapter in
``morpho.py`` replaces this transparently when the real dictionaries are
importable.

Data format: each entry is ``(lemma, base_grams, [(surface, form_grams)...])``
where every form's grammeme set is ``base_grams | form_grams``.
"""

# Grammeme registry for gram() predicate validation (OpenCorpora tag set).
KNOWN_GRAMS = frozenset("""
NOUN ADJF ADJS COMP VERB INFN PRTF PRTS GRND NUMR ADVB NPRO PRED PREP
CONJ PRCL INTJ PNCT NUMB LATN ROMN UNKN
anim inan masc femn neut Ms-f GNdr Sgtm Pltm Fixd
sing plur
nomn gent datv accs ablt loct voct gen1 gen2 acc2 loc1 loc2
Abbr Name Surn Patr Geox Orgn Trad Subx Supr Qual Apro Anum Poss V-ey V-oy
Cmp2 V-ej perf impf tran intr Impe Impx Mult Refl
1per 2per 3per past pres futr indc impr incl excl actv pssv
Infr Slng Arch Litr Erro Dist Ques Dmns Prnt V-be V-en V-ie V-bi Fimp
Prdx Coun Coll V-sh Af-p Inmx Vpre Anph Init Adjx Hypo
""".split())


def _n(lemma, base, forms):
    """Noun-like paradigm: base grams shared by all forms."""
    base = frozenset(base.split())
    return (lemma, base, [(s, frozenset(g.split())) for s, g in forms])


# --- conformance vocabulary -------------------------------------------------

PARADIGMS = [
    # сталь (steel) fem noun — 'стали' must normalize to {сталь, стать}
    _n('сталь', 'NOUN inan femn', [
        ('сталь', 'sing nomn'), ('сталь', 'sing accs'),
        ('стали', 'sing gent'), ('стали', 'sing datv'), ('стали', 'sing loct'),
        ('стали', 'plur nomn'), ('стали', 'plur accs'),
    ]),
    # стать (to become) verb
    _n('стать', 'VERB perf intr', [
        ('стать', 'INFN'),
        ('стал', 'masc sing past indc'),
        ('стала', 'femn sing past indc'),
        ('стало', 'neut sing past indc'),
        ('стали', 'plur past indc'),
    ]),
    _n('сирота', 'NOUN anim Ms-f', [
        ('сирота', 'sing nomn'), ('сироты', 'sing gent'),
        ('сироте', 'sing datv'), ('сироту', 'sing accs'),
        ('сироты', 'plur nomn'),
    ]),
    _n('диск', 'NOUN inan masc', [
        ('диск', 'sing nomn'), ('диск', 'sing accs'),
        ('диска', 'sing gent'), ('диске', 'sing loct'),
        ('диски', 'plur accs'), ('диски', 'plur nomn'),
        ('дисков', 'plur gent'),
    ]),
    _n('александр', 'NOUN anim masc Name', [
        ('александр', 'sing nomn'), ('александра', 'sing gent'),
        ('александру', 'sing datv'), ('александра', 'sing accs'),
        ('александром', 'sing ablt'), ('александре', 'sing loct'),
        ('александры', 'plur nomn'), ('александров', 'plur gent'),
    ]),
    _n('московский', 'ADJF Subx Anph', [
        ('московский', 'masc sing nomn'), ('московского', 'masc sing gent'),
        ('московскому', 'masc sing datv'), ('московским', 'masc sing ablt'),
        ('московском', 'masc sing loct'),
        ('московская', 'femn sing nomn'), ('московской', 'femn sing gent'),
        ('московской', 'femn sing datv'), ('московскую', 'femn sing accs'),
        ('московское', 'neut sing nomn'), ('московским', 'neut sing ablt'),
        ('московские', 'plur nomn'), ('московским', 'plur datv'),
    ]),
    _n('зоопарк', 'NOUN inan masc', [
        ('зоопарк', 'sing nomn'), ('зоопарк', 'sing accs'),
        ('зоопарка', 'sing gent'), ('зоопарке', 'sing loct'),
    ]),
    _n('погода', 'NOUN inan femn', [
        ('погода', 'sing nomn'), ('погоды', 'sing gent'),
        ('погоду', 'sing accs'), ('погоде', 'sing loct'),
    ]),
    _n('саша', 'NOUN anim Ms-f Name', [
        ('саша', 'sing nomn'), ('саши', 'sing gent'),
        ('саше', 'sing datv'), ('сашу', 'sing accs'),
        ('сашей', 'sing ablt'), ('саше', 'sing loct'),
        ('саши', 'plur nomn'),
    ]),
    _n('слово', 'NOUN inan neut', [
        ('слово', 'sing nomn'), ('слово', 'sing accs'),
        ('слова', 'sing gent'), ('слове', 'sing loct'),
        ('слова', 'plur nomn'),
    ]),
    _n('управляющий', 'NOUN anim masc', [
        ('управляющий', 'sing nomn'), ('управляющего', 'sing gent'),
        ('управляющему', 'sing datv'), ('управляющим', 'sing ablt'),
        ('управляющие', 'plur nomn'),
    ]),
    _n('директор', 'NOUN anim masc', [
        ('директор', 'sing nomn'), ('директора', 'sing gent'),
        ('директору', 'sing datv'), ('директором', 'sing ablt'),
        ('директора', 'plur nomn'),
    ]),
    _n('вице', 'NOUN inan masc Fixd', [('вице', 'sing nomn')]),
    _n('мэр', 'NOUN anim masc', [
        ('мэр', 'sing nomn'), ('мэра', 'sing gent'), ('мэру', 'sing datv'),
    ]),
    _n('закрытый', 'ADJF', [
        ('закрытый', 'masc sing nomn'), ('закрытого', 'masc sing gent'),
        ('закрытом', 'masc sing loct'),
        ('закрытая', 'femn sing nomn'),
        ('закрытое', 'neut sing nomn'), ('закрытое', 'neut sing accs'),
        ('закрытом', 'neut sing loct'),
        ('закрытые', 'plur nomn'),
    ]),
    _n('общество', 'NOUN inan neut', [
        ('общество', 'sing nomn'), ('общество', 'sing accs'),
        ('общества', 'sing gent'), ('обществе', 'sing loct'),
        ('общества', 'plur nomn'),
    ]),
    _n('завод', 'NOUN inan masc', [
        ('завод', 'sing nomn'), ('завод', 'sing accs'),
        ('завода', 'sing gent'), ('заводе', 'sing loct'),
        ('заводы', 'plur nomn'),
    ]),
    _n('текст', 'NOUN inan masc', [
        ('текст', 'sing nomn'), ('текст', 'sing accs'),
        ('текста', 'sing gent'), ('тексту', 'sing datv'),
        ('текстом', 'sing ablt'), ('тексте', 'sing loct'),
        ('тексты', 'plur nomn'),
    ]),
    _n('песня', 'NOUN inan femn', [
        ('песня', 'sing nomn'), ('песни', 'sing gent'),
        ('песню', 'sing accs'), ('песней', 'sing ablt'),
        ('песни', 'plur nomn'),
    ]),
    _n('материал', 'NOUN inan masc', [
        ('материал', 'sing nomn'), ('материал', 'sing accs'),
        ('материала', 'sing gent'), ('материалом', 'sing ablt'),
        ('материалы', 'plur nomn'),
    ]),
    _n('информационный', 'ADJF', [
        ('информационный', 'masc sing nomn'),
        ('информационного', 'masc sing gent'),
        ('информационным', 'masc sing ablt'),
        ('информационная', 'femn sing nomn'),
        ('информационные', 'plur nomn'),
    ]),
    _n('учитель', 'NOUN anim masc', [
        ('учитель', 'sing nomn'), ('учителя', 'sing gent'),
        ('учителя', 'sing accs'), ('учителю', 'sing datv'),
        ('учителя', 'plur nomn'),
    ]),
    _n('врач', 'NOUN anim masc', [
        ('врач', 'sing nomn'), ('врача', 'sing gent'),
        ('врача', 'sing accs'), ('врачи', 'plur nomn'),
    ]),
    _n('тысяча', 'NOUN inan femn', [
        ('тысяча', 'sing nomn'), ('тысячи', 'sing gent'),
        ('тысячу', 'sing accs'), ('тысяч', 'plur gent'),
        ('тысячи', 'plur nomn'),
    ]),
    _n('миллион', 'NOUN inan masc', [
        ('миллион', 'sing nomn'), ('миллион', 'sing accs'),
        ('миллиона', 'sing gent'), ('миллионов', 'plur gent'),
        ('миллионы', 'plur nomn'),
    ]),
    _n('рубль', 'NOUN inan masc', [
        ('рубль', 'sing nomn'), ('рубль', 'sing accs'),
        ('рубля', 'sing gent'), ('рублей', 'plur gent'),
        ('рубли', 'plur nomn'),
    ]),
    _n('доллар', 'NOUN inan masc', [
        ('доллар', 'sing nomn'), ('доллар', 'sing accs'),
        ('доллара', 'sing gent'), ('долларов', 'plur gent'),
        ('доллары', 'plur nomn'),
    ]),
    _n('евро', 'NOUN inan masc Fixd', [
        ('евро', 'sing nomn'), ('евро', 'sing gent'), ('евро', 'plur gent'),
    ]),
    _n('год', 'NOUN inan masc', [
        ('год', 'sing nomn'), ('год', 'sing accs'),
        ('года', 'sing gent'), ('году', 'sing datv'),
        ('году', 'sing loct'), ('годы', 'plur nomn'), ('лет', 'plur gent'),
    ]),
    _n('статья', 'NOUN inan femn', [
        ('статья', 'sing nomn'), ('статьи', 'sing gent'),
        ('статье', 'sing datv'), ('статью', 'sing accs'),
        ('статьей', 'sing ablt'), ('статье', 'sing loct'),
    ]),
    _n('пункт', 'NOUN inan masc', [
        ('пункт', 'sing nomn'), ('пункт', 'sing accs'),
        ('пункта', 'sing gent'), ('пункте', 'sing loct'),
    ]),
    _n('инженер', 'NOUN anim masc', [
        ('инженер', 'sing nomn'), ('инженера', 'sing gent'),
        ('инженеру', 'sing datv'), ('инженером', 'sing ablt'),
        ('инженеры', 'plur nomn'),
    ]),
    _n('старший', 'ADJF', [
        ('старший', 'masc sing nomn'), ('старшего', 'masc sing gent'),
        ('старшему', 'masc sing datv'), ('старшим', 'masc sing ablt'),
        ('старшая', 'femn sing nomn'), ('старшие', 'plur nomn'),
    ]),
    _n('менеджер', 'NOUN anim masc', [
        ('менеджер', 'sing nomn'), ('менеджера', 'sing gent'),
        ('менеджеру', 'sing datv'), ('менеджеры', 'plur nomn'),
    ]),
    _n('аналитик', 'NOUN anim masc', [
        ('аналитик', 'sing nomn'), ('аналитика', 'sing gent'),
        ('аналитику', 'sing datv'), ('аналитики', 'plur nomn'),
    ]),
]

# Months: nominative + genitive/locative (enough for DATE grammar inputs).
_MONTHS = [
    ('январь', 'января', 'январе'), ('февраль', 'февраля', 'феврале'),
    ('март', 'марта', 'марте'), ('апрель', 'апреля', 'апреле'),
    ('май', 'мая', 'мае'), ('июнь', 'июня', 'июне'),
    ('июль', 'июля', 'июле'), ('август', 'августа', 'августе'),
    ('сентябрь', 'сентября', 'сентябре'), ('октябрь', 'октября', 'октябре'),
    ('ноябрь', 'ноября', 'ноябре'), ('декабрь', 'декабря', 'декабре'),
]
for _nom, _gen, _loc in _MONTHS:
    PARADIGMS.append(_n(_nom, 'NOUN inan masc', [
        (_nom, 'sing nomn'), (_nom, 'sing accs'),
        (_gen, 'sing gent'), (_loc, 'sing loct'),
        (_nom + 'и' if not _nom.endswith('ь') else _nom[:-1] + 'и', 'plur nomn'),
    ]))

MONTH_NAMES = [m[0] for m in _MONTHS]

# First names: (lemma, gender_grams, [(surface, grams)...])
_FIRST_NAMES = [
    ('иван', 'masc', [('иван', 'sing nomn'), ('ивана', 'sing gent'),
                      ('ивана', 'sing accs'), ('ивану', 'sing datv'),
                      ('иваном', 'sing ablt')]),
    ('сергей', 'masc', [('сергей', 'sing nomn'), ('сергея', 'sing gent'),
                        ('сергея', 'sing accs'), ('сергею', 'sing datv')]),
    ('мария', 'femn', [('мария', 'sing nomn'), ('марии', 'sing gent'),
                       ('марию', 'sing accs'), ('марии', 'sing datv')]),
    ('анна', 'femn', [('анна', 'sing nomn'), ('анны', 'sing gent'),
                      ('анну', 'sing accs'), ('анне', 'sing datv')]),
    ('елена', 'femn', [('елена', 'sing nomn'), ('елены', 'sing gent'),
                       ('елену', 'sing accs'), ('елене', 'sing datv')]),
]
for _lemma, _g, _forms in _FIRST_NAMES:
    PARADIGMS.append(_n(_lemma, f'NOUN anim {_g} Name', _forms))

FIRST_NAME_LEMMAS = [f[0] for f in _FIRST_NAMES]

# -ов/-ев surnames: gendered paradigm pairs built from the stem.
SURNAME_STEMS = ['иванов', 'ульянов', 'петров', 'сидоров', 'кузнецов', 'смирнов']
for _stem in SURNAME_STEMS:
    PARADIGMS.append(_n(_stem, 'NOUN anim masc Surn Sgtm', [
        (_stem, 'sing nomn'), (_stem + 'а', 'sing gent'),
        (_stem + 'а', 'sing accs'), (_stem + 'у', 'sing datv'),
        (_stem + 'ым', 'sing ablt'), (_stem + 'е', 'sing loct'),
        (_stem + 'ы', 'plur nomn'),
    ]))
    PARADIGMS.append(_n(_stem + 'а', 'NOUN anim femn Surn Sgtm', [
        (_stem + 'а', 'sing nomn'), (_stem + 'ой', 'sing gent'),
        (_stem + 'у', 'sing accs'), (_stem + 'ой', 'sing datv'),
        (_stem + 'ой', 'sing ablt'), (_stem + 'ой', 'sing loct'),
        (_stem + 'ы', 'plur nomn'),
    ]))

# Street-type / address nouns for the ADDRESS grammar (the reference
# builds street gazetteers with morph_pipeline — docs/ref.ipynb cell 61;
# pipeline lemma keys need real paradigms, not suffix guesses, to
# resolve the oblique cases the templates use).
STREET_TYPE_LEMMAS = ['улица', 'проспект', 'переулок', 'шоссе']
PARADIGMS.append(_n('улица', 'NOUN inan femn', [
    ('улица', 'sing nomn'), ('улицы', 'sing gent'),
    ('улице', 'sing datv'), ('улицу', 'sing accs'),
    ('улицей', 'sing ablt'), ('улице', 'sing loct'),
    ('улицы', 'plur nomn'), ('улиц', 'plur gent'),
]))
PARADIGMS.append(_n('проспект', 'NOUN inan masc', [
    ('проспект', 'sing nomn'), ('проспекта', 'sing gent'),
    ('проспекту', 'sing datv'), ('проспект', 'sing accs'),
    ('проспектом', 'sing ablt'), ('проспекте', 'sing loct'),
    ('проспекты', 'plur nomn'),
]))
PARADIGMS.append(_n('переулок', 'NOUN inan masc', [
    ('переулок', 'sing nomn'), ('переулка', 'sing gent'),
    ('переулку', 'sing datv'), ('переулок', 'sing accs'),
    ('переулком', 'sing ablt'), ('переулке', 'sing loct'),
    ('переулки', 'plur nomn'),
]))
PARADIGMS.append(_n('шоссе', 'NOUN inan neut Fixd', [
    ('шоссе', 'sing nomn'), ('шоссе', 'sing gent'),
    ('шоссе', 'sing datv'), ('шоссе', 'sing accs'),
    ('шоссе', 'sing ablt'), ('шоссе', 'sing loct'),
    ('шоссе', 'plur nomn'),
]))
PARADIGMS.append(_n('дом', 'NOUN inan masc', [
    ('дом', 'sing nomn'), ('дома', 'sing gent'),
    ('дому', 'sing datv'), ('дом', 'sing accs'),
    ('домом', 'sing ablt'), ('доме', 'sing loct'),
    ('дома', 'plur nomn'),
]))
PARADIGMS.append(_n('адрес', 'NOUN inan masc', [
    ('адрес', 'sing nomn'), ('адреса', 'sing gent'),
    ('адресу', 'sing datv'), ('адрес', 'sing accs'),
    ('адресом', 'sing ablt'), ('адресе', 'sing loct'),
    ('адреса', 'plur nomn'),
]))
