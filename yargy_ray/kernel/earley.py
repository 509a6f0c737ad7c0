"""Earley chart parser + deterministic match resolution.

Behavioral contract: /root/reference/yargy/parser.py, tree/ — an Earley
chart over the token stream with per-column state dedup, token-lookahead
pruning for gazetteer rules, deterministic parse-tree ranking (rank-
lexicographic, tree/constructors.py:114-134) and maximum-coverage
non-overlapping span selection for ``findall``. Determinism is what makes
distributed extraction equal serial extraction, so the ordering rules are
replicated exactly.

Additions over the reference:

* ``max_states`` — a per-document bound on chart states. The reference
  leaves state explosion to the caller (docs/cookbook.ipynb cell 7,
  ``CappedParser``); a distributed engine cannot let one pathological
  conversation stall a partition, so the cap is built in: parsing raises
  :class:`StateOverflow`, which the extraction stage records as a capped
  row instead of failing the job.
"""

from __future__ import annotations

from .grammar import BNFRule as BNFRuleType
from .grammar import GrammarNode, is_bnf_rule
from .gazetteer import GazProd
from .interp import Chain
from .records import best_nonoverlapping, tokens_span
from .relations import AgreementGraph
from .tagging import PassTagger
from .tokenizer import MorphTokenizer, Tokenizer


class StateOverflow(Exception):
    """Raised when a document exceeds the per-parse state budget."""


class Context:
    def __init__(self, tokenizer, tagger=None):
        self.tokenizer = tokenizer
        self.tagger = tagger


# ---------------------------------------------------------------------------
# Parse forest
# ---------------------------------------------------------------------------

class ParseNode:
    __slots__ = ('rule', 'production', 'rank', 'children')

    def __init__(self, rule, production, rank, children):
        self.rule = rule
        self.production = production
        self.rank = rank
        self.children = children

    def attach(self, child):
        return ParseNode(
            self.rule, self.production, self.rank, self.children + [child])

    @property
    def main_token(self):
        return self.children[self.production.main].main_token

    @property
    def interpretator(self):
        return self.rule.interpretator

    @property
    def relation(self):
        return self.rule.relation

    def __lt__(self, other):
        # rank-lexicographic: shared-leaf positions skipped, first differing
        # child rank decides; equal ranks recurse
        if id(self.rule) != id(other.rule):
            raise TypeError('rank comparison across rules')
        if id(self) == id(other):
            return False
        if self.rank != other.rank:
            return self.rank < other.rank
        for a, b in zip(self.children, other.children):
            if isinstance(a, ParseLeaf):
                continue
            if id(a) == id(b):
                continue
            if a.rank < b.rank:
                return True
            if a.rank > b.rank:
                return False
            return a < b
        return False


class ParseLeaf:
    __slots__ = ('predicate', 'token')

    children = ()
    interpretator = None
    relation = None

    def __init__(self, predicate, token):
        self.predicate = predicate
        self.token = token

    @property
    def main_token(self):
        return self.token


def walk_leaves(node):
    stack = [node]
    out = []
    while stack:
        item = stack.pop()
        if isinstance(item, ParseLeaf):
            out.append(item)
        else:
            stack.extend(reversed(item.children))
    return out


class ParseTree:
    __slots__ = ('root', 'range')

    def __init__(self, root, range_):
        self.root = root
        self.range = range_

    def __lt__(self, other):
        if self.range == other.range:
            return self.root < other.root
        start, stop = self.range
        ostart, ostop = other.range
        if start == ostart:
            return stop > ostop          # longer span first
        return start < ostart

    # -- tree passes ---------------------------------------------------------

    def prune_empty(self):
        """Drop epsilon branches (nodes whose children all vanished)."""
        def prune(item):
            if isinstance(item, ParseLeaf):
                return item
            children = [c for c in map(prune, item.children) if c is not None]
            if not children:
                return None
            return ParseNode(item.rule, item.production, item.rank, children)

        root = prune(self.root)
        return ParseTree(root, self.range) if root is not None else None

    def collect_relations(self):
        graph = AgreementGraph()
        stack = [self.root]
        while stack:
            item = stack.pop()
            if isinstance(item, ParseLeaf):
                continue
            if item.relation is not None:
                graph.add(item.relation, item.main_token)
            stack.extend(reversed(item.children))
        return graph

    def constrain(self, graph):
        for leaf in walk_leaves(self.root):
            leaf.token = graph.constrain(leaf.token)
        return self

    def interpret(self):
        """Fold: keep interpretation-bearing nodes, apply bottom-up."""
        if self.root.interpretator is None:
            raise ValueError('root rule has no .interpretation(...)')

        def significant(item):
            # flatten away nodes without interpretators
            for child in item.children:
                if isinstance(child, ParseLeaf) or child.interpretator:
                    yield child
                else:
                    yield from significant(child)

        def fold(item):
            if isinstance(item, ParseLeaf):
                return item.token
            values = [fold(c) for c in significant(item)]
            key = (
                item.production.value
                if isinstance(item.production, GazProd)
                else None
            )
            return item.interpretator(values, key)

        return fold(self.root)


# ---------------------------------------------------------------------------
# Chart
# ---------------------------------------------------------------------------

class EarleyState:
    __slots__ = ('rule', 'production', 'dot', 'origin', 'column', 'node',
                 'completed', 'next_term')

    def __init__(self, rule, production, dot, origin, column, node):
        self.rule = rule
        self.production = production
        self.dot = dot
        self.origin = origin     # start column
        self.column = column     # stop column
        self.node = node
        # plain attributes, not properties: the chart loop reads these
        # millions of times per batch
        terms = production.terms
        if dot >= len(terms):
            self.completed = True
            self.next_term = None
        else:
            self.completed = False
            self.next_term = terms[dot]

    def signature(self):
        return (
            id(self.rule), id(self.production), self.dot,
            self.origin.index, self.column.index,
            tuple(map(id, self.node.children)),
        )


class EarleyColumn:
    __slots__ = ('index', 'token', 'states', 'seen', 'waiting',
                 'predicted', 'first_memo')

    def __init__(self, index, token):
        self.index = index
        self.token = token
        self.states = []
        self.seen = set()
        # waiting[id(rule)] -> states whose dot is before that rule
        self.waiting = {}
        # rules already expanded at this column (predictions are a pure
        # function of (rule, column), so re-predicting is wasted work)
        self.predicted = set()
        # id(first-matcher) -> bool for THIS column's token when it is
        # the lookahead; shared across every rule predicted here
        self.first_memo = {}

    def push(self, state):
        sig = state.signature()
        if sig in self.seen:
            return False
        self.seen.add(sig)
        self.states.append(state)
        term = state.next_term
        if term is not None and term.is_rule:
            self.waiting.setdefault(id(term), []).append(state)
        return True


class Match:
    """One resolved extraction: tokens, char span, lazily interpreted fact."""

    __slots__ = ('tree', 'tokens', 'span')

    def __init__(self, tree):
        self.tree = tree
        self.tokens = [leaf.token for leaf in walk_leaves(tree.root)]
        self.span = tokens_span(self.tokens)

    @property
    def rule(self):
        return self.tree.root.rule

    @property
    def fact(self):
        result = self.tree.interpret()
        value = result.normalized
        return value

    def __repr__(self):
        return f'Match({[t.value for t in self.tokens]!r}, {self.span!r})'


def _prepare_match(tree):
    tree = tree.prune_empty()
    if tree is None:
        return None
    graph = tree.collect_relations()
    if not graph.validate():
        return None
    tree.constrain(graph)
    return Match(tree)


class Parser:
    """Compiled grammar + tokenizer context; reusable across documents.

    Build once per Ray actor (``__init__`` of the extraction callable);
    each ``findall`` call is independent and deterministic.
    """

    def __init__(self, rule, tokenizer=None, tagger=None, max_states=None):
        if tokenizer is None:
            tokenizer = MorphTokenizer()
        if not isinstance(tokenizer, Tokenizer):
            raise TypeError(type(tokenizer))
        self.tokenizer = tokenizer
        self.tagger = tagger if tagger is not None else PassTagger()
        self.max_states = max_states

        if not isinstance(rule, GrammarNode):
            raise TypeError(type(rule))
        context = Context(self.tokenizer, self.tagger)
        rule = rule.activate(context)
        self.rule = rule.as_bnf.start
        self._build_first()

    def _build_first(self):
        """Precompute nullability + FIRST sets for scan-pruned prediction.

        ``self._first[id(prod)]`` is the list of terminal matchers
        (predicates, plus gazetteer rules used atomically via their
        token index) that can begin a derivation of that production;
        ``self._prod_nullable`` holds ids of productions deriving the
        empty string. ``_predict`` skips a production when the lookahead
        token matches none of its FIRST matchers and it is not nullable
        — such a state could never scan nor complete, so pruning it is
        exact. Ranks keep their un-pruned indices, so deterministic
        tree ordering (and therefore P/R vs the reference) is unchanged.
        """
        rules = []
        seen = set()
        stack = [self.rule]
        while stack:
            r = stack.pop()
            if id(r) in seen:
                continue
            seen.add(id(r))
            rules.append(r)
            if type(r) is not BNFRuleType:
                continue  # gazetteer rules are atomic first-matchers
            for prod in r.productions:
                for term in prod.terms:
                    if is_bnf_rule(term):
                        stack.append(term)

        nullable = set()
        changed = True
        while changed:
            changed = False
            for r in rules:
                if type(r) is not BNFRuleType or id(r) in nullable:
                    continue
                for prod in r.productions:
                    if all(is_bnf_rule(t) and id(t) in nullable
                           for t in prod.terms):
                        nullable.add(id(r))
                        changed = True
                        break

        rule_first = {id(r): {} for r in rules}
        prod_first = {}
        prod_nullable = set()
        changed = True
        while changed:
            changed = False
            for r in rules:
                if type(r) is not BNFRuleType:
                    continue
                rf = rule_first[id(r)]
                for prod in r.productions:
                    pf = prod_first.setdefault(id(prod), {})
                    before = len(pf)
                    fully_nullable = True
                    for term in prod.terms:
                        if is_bnf_rule(term):
                            if type(term) is BNFRuleType:
                                pf.update(rule_first[id(term)])
                            else:
                                pf[id(term)] = term
                            if id(term) in nullable:
                                continue
                            fully_nullable = False
                        else:
                            pf[id(term)] = term
                            fully_nullable = False
                        break
                    else:
                        if fully_nullable:
                            prod_nullable.add(id(prod))
                    if len(pf) != before:
                        changed = True
                    before = len(rf)
                    rf.update(pf)
                    if len(rf) != before:
                        changed = True
        self._first = {k: list(v.values()) for k, v in prod_first.items()}
        self._prod_nullable = prod_nullable

        # start-rule FIRST union for the zero-allocation pre-scan: a
        # token stream where no token can begin the start rule needs no
        # chart at all (the common case for a multi-grammar extractor)
        if type(self.rule) is BNFRuleType:
            union = {}
            for prod in self.rule.productions:
                for m in self._first[id(prod)]:
                    union[id(m)] = m
            self._start_first = list(union.values())
            self._fast_path = not any(
                id(p) in prod_nullable for p in self.rule.productions)
        else:
            self._start_first = [self.rule]
            self._fast_path = True

    def _any_start(self, tokens):
        matchers = self._start_first
        for token in tokens:
            for m in matchers:
                if (len(m.predict(token)) > 0 if is_bnf_rule(m)
                        else m(token)):
                    return True
        return False

    # -- chart construction --------------------------------------------------

    def _chart(self, text, everywhere=True):
        tokens = list(self.tagger(self.tokenizer(text)))
        return self._chart_tokens(tokens, everywhere)

    def _chart_tokens(self, tokens, everywhere=True):
        if everywhere and self._fast_path and not self._any_start(tokens):
            return []
        columns = [EarleyColumn(0, None)]
        for i, token in enumerate(tokens, 1):
            columns.append(EarleyColumn(i, token))

        budget = self.max_states
        total = 0
        n = len(columns)
        start_rule = self.rule
        for ci in range(n):
            column = columns[ci]
            predicted = column.predicted
            lookahead = columns[ci + 1] if ci + 1 < n else None
            if ci == 0 or everywhere:
                predicted.add(id(start_rule))
                total += self._predict(column, lookahead, start_rule)
            si = 0
            states = column.states
            while si < len(states):
                state = states[si]
                si += 1
                if state.completed:
                    total += self._complete(column, state)
                else:
                    term = state.next_term
                    if term.is_rule:
                        # inline predicted-memo check: most states wait
                        # on an already-expanded rule
                        tid = id(term)
                        if tid not in predicted:
                            predicted.add(tid)
                            total += self._predict(column, lookahead, term)
                    elif lookahead is not None:
                        total += self._scan(lookahead, term, state)
                if budget is not None and total > budget:
                    raise StateOverflow(total)
        return columns

    def _predict(self, column, lookahead, rule):
        # callers own the column.predicted memo (checked inline)
        if lookahead is None:
            pairs = enumerate(rule.productions)
        elif type(rule) is BNFRuleType:
            # scan-pruning: drop productions whose FIRST set rejects the
            # lookahead token (they could never scan nor complete);
            # ranks keep their original indices for stable tree order
            token = lookahead.token
            memo = lookahead.first_memo
            first = self._first
            nullable = self._prod_nullable
            pairs = []
            for rank, production in enumerate(rule.productions):
                pid = id(production)
                if pid in nullable or self._first_matches(
                        first[pid], token, memo):
                    pairs.append((rank, production))
        else:
            # gazetteer rules prune via their own token index
            pairs = enumerate(rule.predict(lookahead.token))
        added = 0
        for rank, production in pairs:
            node = ParseNode(rule, production, rank, [])
            added += column.push(EarleyState(
                rule, production, 0, column, column, node))
        return added

    @staticmethod
    def _first_matches(matchers, token, memo):
        for matcher in matchers:
            mid = id(matcher)
            hit = memo.get(mid)
            if hit is None:
                if is_bnf_rule(matcher):
                    hit = len(matcher.predict(token)) > 0
                else:
                    hit = bool(matcher(token))
                memo[mid] = hit
            if hit:
                return True
        return False

    def _scan(self, lookahead, predicate, state):
        # NOTE: memoizing the predicate bool in first_memo here was
        # measured SLOWER (dict get/put beats an eq-compare predicate);
        # scan predicates are mostly cheap, so call them directly
        token = lookahead.token
        if not predicate(token):
            return 0
        leaf = ParseLeaf(predicate, predicate.constrain(token))
        return lookahead.push(EarleyState(
            state.rule, state.production, state.dot + 1,
            state.origin, lookahead, state.node.attach(leaf)))

    def _complete(self, column, completed):
        waiting = completed.origin.waiting.get(id(completed.rule))
        if not waiting:
            return 0
        added = 0
        wi = 0
        while wi < len(waiting):
            state = waiting[wi]
            wi += 1
            added += column.push(EarleyState(
                state.rule, state.production, state.dot + 1,
                state.origin, column, state.node.attach(completed.node)))
        return added

    def _final_states(self, columns, everywhere=True):
        search = columns if everywhere else columns[-1:]
        for column in search:
            for state in column.states:
                if state.completed and id(state.rule) == id(self.rule):
                    yield state

    # -- public API ----------------------------------------------------------

    def tokenize(self, text):
        """Tokenize + tag once; reusable across parsers sharing a tokenizer."""
        return list(self.tagger(self.tokenizer(text)))

    def findall_tokens(self, tokens):
        """``findall`` over a pre-tokenized stream.

        Lets an extraction actor running N grammars tokenize (and run
        morphology) once per document instead of once per grammar.
        """
        columns = self._chart_tokens(tokens)
        return self._resolve(columns)

    def findall(self, text):
        """All non-overlapping matches, maximum-coverage, span order."""
        columns = self._chart(text)
        return self._resolve(columns)

    def _resolve(self, columns):
        trees = sorted(
            ParseTree(s.node, (s.origin.index, s.column.index))
            for s in self._final_states(columns)
        )
        spans = []
        by_span = {}
        for tree in trees:
            span = tree.range
            if span in by_span:
                continue
            match = _prepare_match(tree)
            if match is not None:
                spans.append(span)
                by_span[span] = match
        for span in best_nonoverlapping(spans):
            yield by_span[span]

    def find(self, text):
        for match in self.findall(text):
            return match
        return None

    def trees(self, text):
        """All final parse trees, deterministic order (debug aid;
        feeds ``kernel.dot.tree_as_dot``)."""
        columns = self._chart(text)
        return sorted(
            ParseTree(s.node, (s.origin.index, s.column.index))
            for s in self._final_states(columns)
        )

    def explain(self, text):
        """Chart dump as text — the reference's chart pretty-printing
        (parser.py:107-124): per column, its token and every Earley
        state with a dotted production. Debug aid only."""
        from .dot import chart_source
        columns = self._chart(text)
        return '\n'.join(chart_source(columns))

    def match(self, text):
        """Whole-string parse; best tree only."""
        columns = self._chart(text, everywhere=False)
        trees = sorted(
            ParseTree(s.node, (s.origin.index, s.column.index))
            for s in self._final_states(columns, everywhere=False)
        )
        for tree in trees:
            m = _prepare_match(tree)
            if m is not None:
                return m
        return None

    def extract(self, text):
        """Every (possibly overlapping) match — debug mode."""
        columns = self._chart(text)
        for state in self._final_states(columns):
            tree = ParseTree(state.node, (state.origin.index, state.column.index))
            m = _prepare_match(tree)
            if m is not None:
                yield m
