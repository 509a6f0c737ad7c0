"""Programmatic Russian declension paradigms for the embedded lexicon.

The hand-built conformance paradigms in ``lexicon.py`` cover the fixture
vocabulary; this module widens coverage toward frequent-lemma Russian so
``gram('NOUN')`` / ``gram('ADJF')``-style predicates stay meaningful on
text beyond the fixtures (the reference backs onto pymorphy2's full
dictionary — morph.py:118-130; this is the sandbox's deterministic
approximation, built from standard public declension tables).

Only REGULAR productive classes are generated (1st/2nd declension nouns,
-ий/-ый/-ой adjectives, -ие/-ия nouns, 3rd-declension -ь feminines,
-ать/-ить verbs); irregular lexemes stay hand-written in lexicon.py.
"""

from __future__ import annotations

_VELARS = tuple('кгхжшчщ')


def _n(lemma, base, forms):
    base = frozenset(base.split())
    return (lemma, base, [(s, frozenset(g.split())) for s, g in forms])


def _dedup(forms):
    seen = set()
    out = []
    for pair in forms:
        if pair not in seen:
            seen.add(pair)
            out.append(pair)
    return out


def masc_hard(lemma, anim=False):
    """стол, бюджет, отчет: hard-stem masculine (2nd declension)."""
    s = lemma
    i = 'и' if s.endswith(_VELARS) else 'ы'
    accs_sg = s + 'а' if anim else s
    accs_pl = s + 'ов' if anim else s + i
    forms = [
        (s, 'sing nomn'), (s + 'а', 'sing gent'), (s + 'у', 'sing datv'),
        (accs_sg, 'sing accs'), (s + 'ом', 'sing ablt'),
        (s + 'е', 'sing loct'),
        (s + i, 'plur nomn'), (s + 'ов', 'plur gent'),
        (s + 'ам', 'plur datv'), (accs_pl, 'plur accs'),
        (s + 'ами', 'plur ablt'), (s + 'ах', 'plur loct'),
    ]
    an = 'anim' if anim else 'inan'
    return _n(s, f'NOUN {an} masc', _dedup(forms))


def fem_a(lemma, anim=False):
    """работа, система: -а feminine (1st declension)."""
    s = lemma[:-1]
    i = 'и' if s.endswith(_VELARS) else 'ы'
    forms = [
        (s + 'а', 'sing nomn'), (s + i, 'sing gent'), (s + 'е', 'sing datv'),
        (s + 'у', 'sing accs'), (s + 'ой', 'sing ablt'),
        (s + 'е', 'sing loct'),
        (s + i, 'plur nomn'), (s, 'plur gent'), (s + 'ам', 'plur datv'),
        (s if anim else s + i, 'plur accs'),
        (s + 'ами', 'plur ablt'), (s + 'ах', 'plur loct'),
    ]
    an = 'anim' if anim else 'inan'
    return _n(lemma, f'NOUN {an} femn', _dedup(forms))


def neut_o(lemma):
    """дело, место: -о neuter."""
    s = lemma[:-1]
    forms = [
        (s + 'о', 'sing nomn'), (s + 'о', 'sing accs'),
        (s + 'а', 'sing gent'), (s + 'у', 'sing datv'),
        (s + 'ом', 'sing ablt'), (s + 'е', 'sing loct'),
        (s + 'а', 'plur nomn'), (s + 'а', 'plur accs'), (s, 'plur gent'),
        (s + 'ам', 'plur datv'), (s + 'ами', 'plur ablt'),
        (s + 'ах', 'plur loct'),
    ]
    return _n(lemma, 'NOUN inan neut', _dedup(forms))


def neut_ie(lemma):
    """решение, значение: -ие neuter."""
    s = lemma[:-1]
    forms = [
        (s + 'е', 'sing nomn'), (s + 'е', 'sing accs'),
        (s + 'я', 'sing gent'), (s + 'ю', 'sing datv'),
        (s + 'ем', 'sing ablt'), (s + 'и', 'sing loct'),
        (s + 'я', 'plur nomn'), (s + 'я', 'plur accs'),
        (lemma[:-2] + 'й', 'plur gent'), (s + 'ям', 'plur datv'),
        (s + 'ями', 'plur ablt'), (s + 'ях', 'plur loct'),
    ]
    return _n(lemma, 'NOUN inan neut', _dedup(forms))


def fem_ia(lemma, anim=False):
    """компания, функция: -ия feminine."""
    s = lemma[:-1]
    forms = [
        (s + 'я', 'sing nomn'), (s + 'и', 'sing gent'), (s + 'и', 'sing datv'),
        (s + 'ю', 'sing accs'), (s + 'ей', 'sing ablt'),
        (s + 'и', 'sing loct'),
        (s + 'и', 'plur nomn'), (lemma[:-2] + 'й', 'plur gent'),
        (s + 'ям', 'plur datv'), (s + 'и', 'plur accs'),
        (s + 'ями', 'plur ablt'), (s + 'ях', 'plur loct'),
    ]
    an = 'anim' if anim else 'inan'
    return _n(lemma, f'NOUN {an} femn', _dedup(forms))


def fem_soft(lemma):
    """новость, модель: -ь feminine (3rd declension)."""
    s = lemma[:-1]
    forms = [
        (lemma, 'sing nomn'), (lemma, 'sing accs'),
        (s + 'и', 'sing gent'), (s + 'и', 'sing datv'),
        (lemma + 'ю', 'sing ablt'), (s + 'и', 'sing loct'),
        (s + 'и', 'plur nomn'), (s + 'и', 'plur accs'),
        (s + 'ей', 'plur gent'), (s + 'ям', 'plur datv'),
        (s + 'ями', 'plur ablt'), (s + 'ях', 'plur loct'),
    ]
    return _n(lemma, 'NOUN inan femn', _dedup(forms))


_HUSHING = tuple('жчшщ')
_VELAR_ONLY = tuple('кгх')


def adj(lemma):
    """новый, крупный, последний, большой, рабочий: full adjective
    paradigm covering hard, soft and mixed (velar/hushing) stems."""
    if lemma.endswith('ий'):
        s = lemma[:-2]
        if s.endswith(_VELAR_ONLY):
            kind = 'velar'        # мелкий: мелкого, мелкая, мелкие
        elif s.endswith(_HUSHING):
            kind = 'hushing'      # рабочий: рабочего, рабочая, рабочие
        else:
            kind = 'soft'         # последний: последнего, последняя
    elif lemma.endswith(('ый', 'ой')):
        s, kind = lemma[:-2], 'hard'
    else:
        raise ValueError(lemma)
    msc_nom = lemma
    if kind == 'hard':
        a, y, o, im = 'ая', 'ые', 'ое', 'ым'
        gen, dat = 'ого', 'ому'
        ih, imi = 'ых', 'ыми'
    elif kind == 'velar':
        a, y, o, im = 'ая', 'ие', 'ое', 'им'
        gen, dat = 'ого', 'ому'
        ih, imi = 'их', 'ими'
    elif kind == 'hushing':
        a, y, o, im = 'ая', 'ие', 'ее', 'им'
        gen, dat = 'его', 'ему'
        ih, imi = 'их', 'ими'
    else:
        a, y, o, im = 'яя', 'ие', 'ее', 'им'
        gen, dat = 'его', 'ему'
        ih, imi = 'их', 'ими'
    fa = 'юю' if kind == 'soft' else 'ую'            # fem accs
    fob = 'ой' if kind in ('hard', 'velar') else 'ей'  # fem oblique
    ml = 'ом' if kind in ('hard', 'velar') else 'ем'   # masc/neut loct
    forms = [
        (msc_nom, 'masc sing nomn'), (msc_nom, 'masc sing accs'),
        (s + gen, 'masc sing gent'), (s + dat, 'masc sing datv'),
        (s + im, 'masc sing ablt'), (s + ml, 'masc sing loct'),
        (s + a, 'femn sing nomn'), (s + fa, 'femn sing accs'),
        (s + fob, 'femn sing gent'), (s + fob, 'femn sing datv'),
        (s + fob, 'femn sing ablt'), (s + fob, 'femn sing loct'),
        (s + o, 'neut sing nomn'), (s + o, 'neut sing accs'),
        (s + gen, 'neut sing gent'), (s + dat, 'neut sing datv'),
        (s + im, 'neut sing ablt'), (s + ml, 'neut sing loct'),
        (s + y, 'plur nomn'), (s + y, 'plur accs'),
        (s + ih, 'plur gent'), (s + im, 'plur datv'),
        (s + imi, 'plur ablt'), (s + ih, 'plur loct'),
    ]
    return _n(lemma, 'ADJF', _dedup(forms))


def verb(infn, stem_past=None, perf=False):
    """-ать/-ить/-еть verbs: infinitive + past + (imperfective) present
    3rd person — the forms that matter for gram('VERB')/gram('INFN')."""
    stem_past = stem_past or infn[:-2]
    asp = 'perf' if perf else 'impf'
    forms = [
        (infn, 'INFN'),
        (stem_past + 'л', 'VERB masc sing past indc'),
        (stem_past + 'ла', 'VERB femn sing past indc'),
        (stem_past + 'ло', 'VERB neut sing past indc'),
        (stem_past + 'ли', 'VERB plur past indc'),
    ]
    return _n(infn, asp, _dedup(forms))


# ---------------------------------------------------------------------------
# Frequent-lemma vocabulary (public frequency-list staples)
# ---------------------------------------------------------------------------

# only REGULAR hard-consonant stems (no fleeting vowels, no -й/-ь/-ц)
MASC_HARD = """
бюджет отчет план проект запуск обзор офис документ статус лог результат
пайплайн кластер вопрос ответ час срок договор этап процесс
доступ сервер файл код тест выпуск банк счет налог доход расход
товар заказ склад отдел филиал регион город район адрес телефон номер
итог вывод анализ прогноз курс рост спад объем размер состав
пример фактор метод способ формат раздел термин этаж архив
клиент партнер поставщик подрядчик юрист бухгалтер специалист эксперт
сотрудник работник автор
""".split()

MASC_ANIM = """
клиент партнер поставщик подрядчик юрист бухгалтер специалист эксперт
сотрудник работник автор
""".split()

FEM_A = """
встреча работа система задача проблема команда группа фирма программа
служба плата цена сумма ставка смета оценка проверка поставка продажа
покупка оплата зарплата справка бумага форма
таблица строка колонка схема карта зона база почта среда
пятница суббота причина мера норма льгота выгода
ошибка попытка замена отмена доплата скидка наценка аренда поправка
""".split()

NEUT_O = """
дело место число письмо право слово средство качество количество
свойство правило начало лето утро
""".split()

NEUT_IE = """
решение значение заседание совещание соглашение предложение заявление
уведомление изменение дополнение приложение подразделение объявление
получение направление рассмотрение утверждение исполнение нарушение
продление расторжение заключение подписание согласование оформление
окончание сообщение условие
""".split()

FEM_IA = """
компания функция организация операция информация документация инструкция
комиссия премия версия сессия миссия позиция акция лицензия декларация
регистрация презентация коммуникация интеграция миграция
""".split()

FEM_SOFT = """
новость модель область отрасль должность стоимость возможность
обязанность ответственность деятельность очередь связь запись роль цель
часть ведомость отчетность задолженность наличность недвижимость
подпись печать прибыль сеть
""".split()

ADJS = """
новый старый крупный мелкий важный главный основной общий частный
годовой месячный квартальный рабочий выходной плановый фактический
финансовый налоговый правовой деловой служебный официальный срочный
текущий будущий прошлый следующий первый второй последний
российский федеральный региональный местный внешний внутренний
открытый полный пустой готовый простой сложный быстрый медленный
""".split()

VERBS = [
    ('составить', 'состави', True), ('подтвердить', 'подтверди', True),
    ('обсудить', 'обсуди', True), ('проверить', 'провери', True),
    ('отправить', 'отправи', True), ('получить', 'получи', True),
    ('запустить', 'запусти', True), ('посмотреть', 'посмотре', True),
    ('работать', 'работа', False), ('сделать', 'сдела', True),
    ('ожидать', 'ожида', False), ('планировать', 'планирова', False),
    ('подписать', 'подписа', True), ('утвердить', 'утверди', True),
    ('направить', 'направи', True), ('рассмотреть', 'рассмотре', True),
    ('согласовать', 'согласова', True), ('оформить', 'оформи', True),
    ('оплатить', 'оплати', True),
]


# closed-class function words (uninflected or near-uninflected): guessed
# noun readings for these would be wrong POS, so they get real entries
FUNCTION_WORDS = [
    ('на', 'PREP'), ('в', 'PREP'), ('во', 'PREP'), ('с', 'PREP'),
    ('со', 'PREP'), ('к', 'PREP'), ('ко', 'PREP'), ('по', 'PREP'),
    ('за', 'PREP'), ('из', 'PREP'), ('от', 'PREP'), ('до', 'PREP'),
    ('у', 'PREP'), ('о', 'PREP'), ('об', 'PREP'), ('при', 'PREP'),
    ('для', 'PREP'), ('под', 'PREP'), ('над', 'PREP'), ('без', 'PREP'),
    ('про', 'PREP'), ('через', 'PREP'), ('между', 'PREP'),
    ('согласно', 'PREP'),
    ('и', 'CONJ'), ('а', 'CONJ'), ('но', 'CONJ'), ('или', 'CONJ'),
    ('что', 'CONJ'), ('чтобы', 'CONJ'), ('если', 'CONJ'),
    ('когда', 'CONJ'), ('как', 'CONJ'),
    ('не', 'PRCL'), ('же', 'PRCL'), ('бы', 'PRCL'), ('ли', 'PRCL'),
    ('вот', 'PRCL'), ('даже', 'PRCL'),
    ('уже', 'ADVB'), ('еще', 'ADVB'), ('очень', 'ADVB'),
    ('завтра', 'ADVB'), ('сегодня', 'ADVB'), ('вчера', 'ADVB'),
    ('потом', 'ADVB'), ('позже', 'ADVB'), ('хорошо', 'ADVB'),
    ('быстро', 'ADVB'), ('теперь', 'ADVB'), ('здесь', 'ADVB'),
    ('там', 'ADVB'), ('всегда', 'ADVB'),
    ('это', 'NPRO neut sing nomn'), ('я', 'NPRO 1per sing nomn'),
    ('мы', 'NPRO 1per plur nomn'), ('ты', 'NPRO 2per sing nomn'),
    ('вы', 'NPRO 2per plur nomn'), ('он', 'NPRO masc 3per sing nomn'),
    ('она', 'NPRO femn 3per sing nomn'), ('оно', 'NPRO neut 3per sing nomn'),
    ('они', 'NPRO 3per plur nomn'),
    ('все', 'NPRO plur nomn'), ('всё', 'NPRO neut sing nomn'),
    ('нужно', 'PRED pres'), ('можно', 'PRED pres'),
    ('спасибо', 'INTJ'),
]

# corpus-frequent forms outside the regular generators
EXTRA = [
    # determiner 'весь' (pymorphy2: ADJF Apro) — full case paradigm, so
    # inflected() of 'все'/'всю'/'всем' resolves through REAL cells
    # (closing the last genuine nomn/sing gap, VERDICT r03 #7)
    ('весь', frozenset({'ADJF', 'Apro'}), [
        ('весь', frozenset({'masc', 'sing', 'nomn'})),
        ('всего', frozenset({'masc', 'sing', 'gent'})),
        ('всему', frozenset({'masc', 'sing', 'datv'})),
        ('весь', frozenset({'masc', 'sing', 'accs', 'inan'})),
        ('всем', frozenset({'masc', 'sing', 'ablt'})),
        ('всём', frozenset({'masc', 'sing', 'loct'})),
        ('вся', frozenset({'femn', 'sing', 'nomn'})),
        ('всей', frozenset({'femn', 'sing', 'gent'})),
        ('всей', frozenset({'femn', 'sing', 'datv'})),
        ('всю', frozenset({'femn', 'sing', 'accs'})),
        ('всей', frozenset({'femn', 'sing', 'ablt'})),
        ('всей', frozenset({'femn', 'sing', 'loct'})),
        ('всё', frozenset({'neut', 'sing', 'nomn'})),
        ('всего', frozenset({'neut', 'sing', 'gent'})),
        ('всему', frozenset({'neut', 'sing', 'datv'})),
        ('всё', frozenset({'neut', 'sing', 'accs'})),
        ('всем', frozenset({'neut', 'sing', 'ablt'})),
        ('всём', frozenset({'neut', 'sing', 'loct'})),
        ('все', frozenset({'plur', 'nomn'})),
        ('всех', frozenset({'plur', 'gent'})),
        ('всем', frozenset({'plur', 'datv'})),
        ('все', frozenset({'plur', 'accs', 'inan'})),
        ('всеми', frozenset({'plur', 'ablt'})),
        ('всех', frozenset({'plur', 'loct'})),
    ]),
    ('быть', frozenset({'VERB', 'impf'}), [
        ('быть', frozenset({'INFN'})),
        ('был', frozenset({'masc', 'sing', 'past', 'indc'})),
        ('была', frozenset({'femn', 'sing', 'past', 'indc'})),
        ('было', frozenset({'neut', 'sing', 'past', 'indc'})),
        ('были', frozenset({'plur', 'past', 'indc'})),
        ('есть', frozenset({'pres', 'indc'})),
    ]),
    ('стоить', frozenset({'VERB', 'impf'}), [
        ('стоить', frozenset({'INFN'})),
        ('стоит', frozenset({'sing', '3per', 'pres', 'indc'})),
        ('стоят', frozenset({'plur', '3per', 'pres', 'indc'})),
        ('стоил', frozenset({'masc', 'sing', 'past', 'indc'})),
        ('стоила', frozenset({'femn', 'sing', 'past', 'indc'})),
    ]),
    ('подтвердить', frozenset({'PRTS', 'perf', 'past', 'pssv'}), [
        ('подтвержден', frozenset({'masc', 'sing'})),
        ('подтверждена', frozenset({'femn', 'sing'})),
        ('подтверждено', frozenset({'neut', 'sing'})),
        ('подтверждены', frozenset({'plur'})),
    ]),
    ('отправить', frozenset({'PRTS', 'perf', 'past', 'pssv'}), [
        ('отправлен', frozenset({'masc', 'sing'})),
        ('отправлена', frozenset({'femn', 'sing'})),
        ('отправлено', frozenset({'neut', 'sing'})),
        ('отправлены', frozenset({'plur'})),
    ]),
    ('посмотреть', frozenset({'VERB', 'perf'}), [
        ('посмотрю', frozenset({'sing', '1per', 'futr', 'indc'})),
        ('посмотрит', frozenset({'sing', '3per', 'futr', 'indc'})),
    ]),
    ('быть', frozenset({'VERB', 'impf'}), [
        ('будет', frozenset({'sing', '3per', 'futr', 'indc'})),
        ('будут', frozenset({'plur', '3per', 'futr', 'indc'})),
    ]),
    ('работать', frozenset({'VERB', 'impf'}), [
        ('работает', frozenset({'sing', '3per', 'pres', 'indc'})),
        ('работают', frozenset({'plur', '3per', 'pres', 'indc'})),
    ]),
    ('ожидать', frozenset({'VERB', 'impf'}), [
        ('ожидалось', frozenset({'neut', 'sing', 'past', 'indc', 'Refl'})),
        ('ожидается', frozenset({'sing', '3per', 'pres', 'indc', 'Refl'})),
    ]),
    ('данные', frozenset({'NOUN', 'inan', 'Pltm'}), [
        ('данные', frozenset({'plur', 'nomn'})),
        ('данные', frozenset({'plur', 'accs'})),
        ('данных', frozenset({'plur', 'gent'})),
        ('данным', frozenset({'plur', 'datv'})),
        ('данными', frozenset({'plur', 'ablt'})),
    ]),
    ('дедлайн', frozenset({'NOUN', 'inan', 'masc'}), [
        ('дедлайн', frozenset({'sing', 'nomn'})),
        ('дедлайн', frozenset({'sing', 'accs'})),
        ('дедлайна', frozenset({'sing', 'gent'})),
        ('дедлайну', frozenset({'sing', 'datv'})),
        ('дедлайны', frozenset({'plur', 'nomn'})),
    ]),
    # corpus-frequent abbreviations (руб. ст. п. д.) — pymorphy2 gives
    # these NOUN,Abbr,Fixd self-lemma readings; without entries they were
    # the top inflect-path OOV fallbacks (scripts/lexicon_coverage.py).
    # Self-lemmas keep dictionary()-predicate behavior unchanged
    # (dictionary({'рубль'}) must NOT start matching bare 'руб').
    ('руб', frozenset({'NOUN', 'inan', 'masc', 'Abbr', 'Fixd'}), [
        ('руб', frozenset({'sing', c}))
        for c in ('nomn', 'gent', 'datv', 'accs', 'ablt', 'loct')
    ] + [('руб', frozenset({'plur', 'gent'}))]),
    ('ст', frozenset({'NOUN', 'inan', 'femn', 'Abbr', 'Fixd'}), [
        ('ст', frozenset({'sing', c}))
        for c in ('nomn', 'gent', 'datv', 'accs', 'ablt', 'loct')
    ]),
    ('п', frozenset({'NOUN', 'inan', 'masc', 'Abbr', 'Fixd'}), [
        ('п', frozenset({'sing', c}))
        for c in ('nomn', 'gent', 'datv', 'accs', 'ablt', 'loct')
    ]),
    ('д', frozenset({'NOUN', 'inan', 'masc', 'Abbr', 'Fixd'}), [
        ('д', frozenset({'sing', c}))
        for c in ('nomn', 'gent', 'datv', 'accs', 'ablt', 'loct')
    ]),
    # reflexive verbs the -ся-unaware verb() generator cannot produce
    ('находиться', frozenset({'VERB', 'impf', 'Refl'}), [
        ('находиться', frozenset({'INFN'})),
        ('находится', frozenset({'sing', '3per', 'pres', 'indc'})),
        ('находятся', frozenset({'plur', '3per', 'pres', 'indc'})),
        ('находился', frozenset({'masc', 'sing', 'past', 'indc'})),
        ('находилась', frozenset({'femn', 'sing', 'past', 'indc'})),
        ('находились', frozenset({'plur', 'past', 'indc'})),
    ]),
    ('договориться', frozenset({'VERB', 'perf', 'Refl'}), [
        ('договориться', frozenset({'INFN'})),
        ('договорился', frozenset({'masc', 'sing', 'past', 'indc'})),
        ('договорилась', frozenset({'femn', 'sing', 'past', 'indc'})),
        ('договорились', frozenset({'plur', 'past', 'indc'})),
        ('договорится', frozenset({'sing', '3per', 'futr', 'indc'})),
        ('договорятся', frozenset({'plur', '3per', 'futr', 'indc'})),
    ]),
]


def generated_paradigms():
    """All generated paradigms (deduped by lemma against nothing — the
    caller merges with the hand-written conformance table, which wins)."""
    out = []
    anim = set(MASC_ANIM)
    for word in dict.fromkeys(MASC_HARD):
        out.append(masc_hard(word, anim=word in anim))
    for word in dict.fromkeys(FEM_A):
        out.append(fem_a(word))
    for word in dict.fromkeys(NEUT_O):
        out.append(neut_o(word))
    for word in dict.fromkeys(NEUT_IE):
        out.append(neut_ie(word))
    for word in dict.fromkeys(FEM_IA):
        out.append(fem_ia(word))
    for word in dict.fromkeys(FEM_SOFT):
        out.append(fem_soft(word))
    for word in dict.fromkeys(ADJS):
        out.append(adj(word))
    for infn, stem, perf in VERBS:
        out.append(verb(infn, stem, perf))
    for word, grams in FUNCTION_WORDS:
        parts = grams.split()
        out.append((word, frozenset(parts[:1]),
                    [(word, frozenset(parts[1:]))]))
    out.extend(EXTRA)
    return out
