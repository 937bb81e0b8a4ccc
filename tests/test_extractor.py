"""Golden-sentence tests in the reference's style: sentence in, exact
triple set out (cf. compose_test.py's derivation → golden DRS pattern,
reference src/python/marbles/ie/test/compose_test.py:98-120)."""

from ie_spark.extraction.extractor import extract_sentence


def triples_of(sentence):
    _, ts = extract_sentence(sentence)
    return {(t.subj, t.pred, t.obj, t.polarity) for t in ts}


def refs_of(sentence):
    _, ts = extract_sentence(sentence)
    return {(t.subj, t.subj_ref, t.event_ref, t.obj, t.obj_ref) for t in ts}


def test_boy_girl_control():
    # reference golden: [X1,E2,E3,X4| boy(X1),want(E2),_EVENT(E2),
    # _ARG0(E2,X1),_ARG1(E2,E3),believe(E3),_ARG0(E3,X1),_ARG1(E3,X4),girl(X4)]
    assert triples_of("The boy wants to believe the girl.") == {
        ("boy", "want", "believe", "pos"),
        ("boy", "believe", "girl", "pos"),
    }


def test_boy_girl_referent_numbering():
    # first-occurrence numbering: boy=1, want=2, believe=3, girl=4
    assert refs_of("The boy wants to believe the girl.") == {
        ("boy", "X1", "E2", "believe", "E3"),
        ("boy", "X1", "E3", "girl", "X4"),
    }


def test_simple_svo():
    assert triples_of("The engineer reviews the patch.") == {
        ("engineer", "review", "patch", "pos")}


def test_copular_np():
    assert triples_of("Anna is a doctor.") == {("Anna", "be", "doctor", "pos")}


def test_copular_adj():
    assert triples_of("The report is ready.") == {("report", "be", "ready", "pos")}


def test_passive():
    assert triples_of("The patch was reviewed by Alice.") == {
        ("Alice", "review", "patch", "pos")}


def test_possessive():
    # reference fixup_possessives → _POSS(owner, owned) (ccg.py:991-1035)
    assert triples_of("Bob's report passed the test.") == {
        ("Bob", "_POSS", "report", "pos"),
        ("report", "pass", "test", "pos"),
    }


def test_appositive_aka():
    # reference post_create_fixup → _AKA alias edges (ccg.py:1073-1183)
    assert triples_of("Anna, a doctor, reviewed the patch.") == {
        ("Anna", "_AKA", "doctor", "pos"),
        ("Anna", "review", "patch", "pos"),
    }


def test_conjoined_subject_distributes():
    assert triples_of("Alice and Bob reviewed the patch.") == {
        ("Alice", "review", "patch", "pos"),
        ("Bob", "review", "patch", "pos"),
    }


def test_conjoined_object_distributes():
    assert triples_of("The engineer fixed the patch and the pipeline.") == {
        ("engineer", "fix", "patch", "pos"),
        ("engineer", "fix", "pipeline", "pos"),
    }


def test_clause_coordination_not_merged():
    assert triples_of("Anna merged the patch and Carol approved the query.") == {
        ("Anna", "merge", "patch", "pos"),
        ("Carol", "approve", "query", "pos"),
    }


def test_vp_coordination_shares_subject():
    assert triples_of("Carol approved the ticket and launched the report.") == {
        ("Carol", "approve", "ticket", "pos"),
        ("Carol", "launch", "report", "pos"),
    }


def test_pronoun_subject():
    # reference _PRON canonicalization (lexeme.py:29-76): 'She' → she(x)
    assert triples_of("She approved the request.") == {
        ("she", "approve", "request", "pos")}


def test_negation_polarity():
    assert triples_of("The boy did not approve the request.") == {
        ("boy", "approve", "request", "neg")}


def test_modal():
    assert triples_of("Alice can deploy the service.") == {
        ("Alice", "deploy", "service", "pos")}


def test_proper_noun_merge():
    # reference resolve_proper_names → 'New-York' (ccg.py:1367-1508)
    assert triples_of("Alice visited New York.") == {
        ("Alice", "visit", "New-York", "pos")}


def test_intransitive():
    assert triples_of("The pipeline stopped.") == {("pipeline", "stop", "", "pos")}


def test_pp_complement():
    assert triples_of("The team protested against the new tax.") == {
        ("team", "protest", "tax", "pos")}


def roles_of(sentence):
    _, ts = extract_sentence(sentence)
    return {(t.subj, t.pred, t.obj, t.role, t.prep) for t in ts}


def test_dative_recipient_is_arg2():
    # reference dative shift: recipient is _ARG2 (lexeme.py:617-743)
    assert roles_of("Alice sent the report to Bob.") == {
        ("Alice", "send", "report", "ARG1", ""),
        ("Alice", "send", "Bob", "ARG2", "to"),
    }


def test_date_number_mentions():
    ms, _ = extract_sentence("The team shipped 3 releases on March 5.")
    kinds = {(m.stem, m.kind) for m in ms}
    assert ("3", "number") in kinds
    assert ("march", "date") in kinds
    assert ("release", "entity") in kinds


def test_empty_and_junk():
    assert triples_of("") == set()
    assert triples_of("???") == set()


def test_subject_relative_clause():
    assert triples_of("The engineer who reviewed the patch approved the request.") == {
        ("engineer", "review", "patch", "pos"),
        ("engineer", "approve", "request", "pos"),
    }


def test_ditransitive_emits_both_roles():
    # reference verbs emit _ARG1 and _ARG2 (lexeme.py:617-743)
    assert triples_of("Alice gave Bob the report.") == {
        ("Alice", "give", "Bob", "pos"),
        ("Alice", "give", "report", "pos"),
    }


def test_imperative_empty_subject():
    # imperative VP[b]: unresolved _ARG0 → empty subject
    assert triples_of("Review the patch.") == {("", "review", "patch", "pos")}
    assert triples_of("Deploy the service and monitor the dashboard.") == {
        ("", "deploy", "service", "pos"),
        ("", "monitor", "dashboard", "pos"),
    }


def test_progressive_passive():
    assert triples_of("The patch was being reviewed by Alice.") == {
        ("Alice", "review", "patch", "pos")}


def test_perfect_aspect():
    assert triples_of("Alice has reviewed the patch.") == {
        ("Alice", "review", "patch", "pos")}


def test_stacked_adverbs():
    assert triples_of("Alice quickly and carefully reviewed the patch.") == {
        ("Alice", "review", "patch", "pos")}


def test_comma_wrapped_relative():
    assert triples_of(
        "The engineer, who examined the dataset, approved the request.") == {
        ("engineer", "examine", "dataset", "pos"),
        ("engineer", "approve", "request", "pos"),
    }


def test_modal_negation():
    assert triples_of("Bob will not deploy the broken service.") == {
        ("Bob", "deploy", "service", "neg")}


def modals_of(sentence):
    _, ts = extract_sentence(sentence)
    return {(t.subj, t.pred, t.obj, t.polarity, t.modal) for t in ts}


def test_modal_is_emitted():
    # reference emits _MODAL(e) conditions (lexeme.py:683-687,832-835)
    assert modals_of("Bob should review the patch.") == {
        ("Bob", "review", "patch", "pos", "should")}
    assert modals_of("The team must not delete the backup.") == {
        ("team", "delete", "backup", "neg", "must")}
    assert modals_of("Alice reviewed the patch.") == {
        ("Alice", "review", "patch", "pos", "")}


def test_ditransitive_roles_distinguish_recipient_and_theme():
    assert roles_of("Alice gave Bob the report.") == {
        ("Alice", "give", "Bob", "ARG2", ""),
        ("Alice", "give", "report", "ARG1", ""),
    }


def test_pp_complement_keeps_preposition():
    # 'against' was previously dropped (reference keeps the oblique
    # preposition in the role label, lexeme.py:617-743)
    assert roles_of("The team protested against the new tax.") == {
        ("team", "protest", "tax", "ARG2", "against")}


def test_copular_attribute_role():
    assert roles_of("The report is ready.") == {
        ("report", "be", "ready", "ATTR", "")}


def test_object_relative_clause():
    # head NP is the embedded verb's fronted object
    assert triples_of("The patch that Alice reviewed failed.") == {
        ("Alice", "review", "patch", "pos"),
        ("patch", "fail", "", "pos"),
    }
    assert triples_of("The patch which Alice reviewed merged the dataset.") == {
        ("Alice", "review", "patch", "pos"),
        ("patch", "merge", "dataset", "pos"),
    }


def test_wh_subject_question():
    # reference wh-questions via S[wq] (ccg/__init__.py:1301-1409)
    assert triples_of("Who approved the patch?") == {
        ("who", "approve", "patch", "pos")}
    assert triples_of("Who can deploy the service?") == {
        ("who", "deploy", "service", "pos")}


def test_wh_object_question_do_support():
    assert triples_of("What did Alice approve?") == {
        ("Alice", "approve", "what", "pos")}
    assert triples_of("What did Bob not review?") == {
        ("Bob", "review", "what", "neg")}


def test_wh_copular_question():
    assert triples_of("Who is the owner?") == {("who", "be", "owner", "pos")}


def constituents_of(sentence):
    from ie_spark.extraction.extractor import extract_constituents
    return {(t, surf, adj) for (t, _s, _e, adj, surf)
            in extract_constituents(sentence)}


def test_constituent_inventory_np_vp_pp():
    # reference gold-constituent style (core/sentence.py:218-321): full
    # phrase inventory with adjunct marking (_mark_if_adjunct, ccg.py:633)
    got = constituents_of("The engineer shipped the release on March 5.")
    assert ("NP", "The engineer", False) in got
    assert ("NP", "the release", False) in got
    # modifier PP is an adjunct
    assert any(t == "PP" and surf.startswith("on March") and adj
               for (t, surf, adj) in got)


def test_constituent_adjp_attributive_vs_predicative():
    got = constituents_of("The urgent ticket is ready.")
    assert ("ADJP", "urgent", True) in got       # attributive → adjunct
    assert ("ADJP", "ready", False) in got       # predicative → complement


def test_constituent_advp_adjunct():
    got = constituents_of("Alice carefully reviewed the patch.")
    assert ("ADVP", "carefully", True) in got
    assert ("NP", "the patch", False) in got


def test_constituent_pp_complement_not_adjunct():
    got = constituents_of("The team protested against the new tax.")
    assert any(t == "PP" and surf == "against the new tax" and not adj
               for (t, surf, adj) in got)


def test_constituent_s_inf():
    got = constituents_of("The boy wants to believe the girl.")
    assert ("S_INF", "to believe", False) in got


def test_complement_clause():
    # reference S[em] verb complements (lexeme.py:744-770): the embedded
    # proposition is the matrix verb's ARG1 event
    assert triples_of("Alice said that the pipeline failed.") == {
        ("Alice", "say", "fail", "pos"),
        ("pipeline", "fail", "", "pos"),
    }
    assert triples_of("Carol thought that Alice reviewed the patch.") == {
        ("Carol", "think", "review", "pos"),
        ("Alice", "review", "patch", "pos"),
    }


def test_that_demonstrative_still_determiner():
    assert triples_of("Bob merged that patch.") == {
        ("Bob", "merge", "patch", "pos")}


def test_relative_on_object_head():
    # object-gap: head NP is the embedded verb's fronted ARG1
    assert triples_of("Bob merged the patch that Alice reviewed.") == {
        ("Bob", "merge", "patch", "pos"),
        ("Alice", "review", "patch", "pos"),
    }
    # subject-gap
    assert triples_of("Bob merged the patch that failed.") == {
        ("Bob", "merge", "patch", "pos"),
        ("patch", "fail", "", "pos"),
    }


def test_subordinate_clause_initial():
    assert triples_of("When the build finished, Alice deployed the service.") == {
        ("build", "finish", "", "pos"),
        ("Alice", "deploy", "service", "pos"),
    }
    assert triples_of("Because the test failed, Alice deleted the patch.") == {
        ("test", "fail", "", "pos"),
        ("Alice", "delete", "patch", "pos"),
    }


def test_subordinate_clause_trailing():
    assert triples_of("Alice deleted the patch because the test failed.") == {
        ("Alice", "delete", "patch", "pos"),
        ("test", "fail", "", "pos"),
    }
    # temporal subordinator keeps its IN tag; the clause-after-PP rule
    # makes the NP the embedded subject instead of a PP object
    assert triples_of("Alice deleted the patch after the build finished.") == {
        ("Alice", "delete", "patch", "pos"),
        ("build", "finish", "", "pos"),
    }


def test_comma_list_coordination():
    assert triples_of("Alice, Bob and Carol reviewed the patch.") == {
        ("Alice", "review", "patch", "pos"),
        ("Bob", "review", "patch", "pos"),
        ("Carol", "review", "patch", "pos"),
    }
    # Oxford comma
    assert triples_of("Alice, Bob, and Carol merged the release.") == {
        ("Alice", "merge", "release", "pos"),
        ("Bob", "merge", "release", "pos"),
        ("Carol", "merge", "release", "pos"),
    }
    assert triples_of(
        "The engineer fixed the patch, the query and the report.") == {
        ("engineer", "fix", "patch", "pos"),
        ("engineer", "fix", "query", "pos"),
        ("engineer", "fix", "report", "pos"),
    }


def test_comma_splice_clauses_not_merged():
    assert triples_of("Alice reviewed the patch, Bob approved the query.") == {
        ("Alice", "review", "patch", "pos"),
        ("Bob", "approve", "query", "pos"),
    }


def test_copular_negation():
    assert triples_of("The patch is not ready.") == {
        ("patch", "be", "ready", "neg")}


def test_discourse_markers_skipped():
    # interjections are transcript boilerplate, never mentions/subjects
    assert triples_of("Thanks, Alice reviewed the patch.") == {
        ("Alice", "review", "patch", "pos")}
    assert triples_of("Okay, the test failed.") == {
        ("test", "fail", "", "pos")}
    ms, _ = extract_sentence("Sure, Bob can merge the release.")
    assert {(m.stem, m.kind) for m in ms
            if m.kind in ("entity", "propername", "pronoun")} == {
        ("Bob", "propername"), ("release", "entity")}


def test_please_keeps_imperative():
    assert triples_of("Please review the patch.") == {
        ("", "review", "patch", "pos")}


def test_agentless_passive_demotes_patient():
    # reference passive role swap (lexeme.py:662-679): no by-phrase →
    # _ARG0 unresolved, surface subject is the ARG1 patient
    assert roles_of("The report was sent to Bob.") == {
        ("", "send", "report", "ARG1", ""),
        ("", "send", "Bob", "ARG2", "to"),
    }
    assert triples_of("The patch was reviewed.") == {
        ("", "review", "patch", "pos")}


def test_existential_there():
    assert triples_of("There is a bug in the pipeline.") == {
        ("", "be", "bug", "pos")}
    assert triples_of("There are three bugs in the dashboard.") == {
        ("", "be", "bug", "pos")}


def test_modal_passive():
    assert modals_of("The patch must be reviewed by Alice.") == {
        ("Alice", "review", "patch", "pos", "must")}


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.text(max_size=300))
    @settings(max_examples=200, deadline=None)
    def test_extract_never_crashes_on_arbitrary_text(s):
        from ie_spark.extraction.extractor import extract_turn
        extract_turn(s)  # must never raise, whatever the input
except ImportError:  # pragma: no cover - hypothesis is baked in here
    pass


def test_inverted_modal_question():
    assert modals_of("Can you deploy the service?") == {
        ("you", "deploy", "service", "pos", "can")}
    assert modals_of("Could you please review the patch?") == {
        ("you", "review", "patch", "pos", "could")}


def test_copular_pp_location():
    assert roles_of("The report is in the dashboard.") == {
        ("report", "be", "dashboard", "ARG2", "in")}


def test_have_possession():
    assert triples_of("Alice has a backup.") == {
        ("Alice", "have", "backup", "pos")}
    assert triples_of("The cluster does not have a backup.") == {
        ("cluster", "have", "backup", "neg")}


def test_generalized_control_verbs():
    assert triples_of("The engineer needs to fix the pipeline.") == {
        ("engineer", "need", "fix", "pos"),
        ("engineer", "fix", "pipeline", "pos"),
    }
    assert triples_of("Bob tried to merge the patch.") == {
        ("Bob", "try", "merge", "pos"),
        ("Bob", "merge", "patch", "pos"),
    }


# --- round-3 code-review regression cases -----------------------------------


def test_subordinate_clause_with_ambiguous_present_verb():
    # 'reviews' after a noun inside a temporal PP is a finite verb when an
    # NP follows — the subordinate clause must survive
    assert {("he", "resign", "", "pos"), ("board", "review", "merger", "pos")} \
        <= triples_of("He resigned after the board reviews the merger.")


def test_noun_complement_does_not_steal_matrix_verb():
    # the zero-complementizer path must not fire inside an object-relative:
    # 'emerged' is the MATRIX verb of 'signs'
    assert {("manager", "expect", "decline", "pos"),
            ("sign", "emerge", "", "pos")} \
        <= triples_of("Signs that managers expect declines emerged.")


def test_ambiguous_verb_before_infinitive():
    assert {("manager", "plan", "leave", "pos"),
            ("manager", "leave", "", "pos")} \
        <= triples_of("The manager plans to leave.")


def test_temporal_np_not_mistaken_for_ditransitive_theme():
    # 'every quarter' is an adjunct; the true object keeps ARG1
    ts = triples_of("The company reports profits every quarter.")
    assert ("company", "report", "profit", "pos") in ts
    assert ("company", "report", "quarter", "pos") not in ts


def test_nonrestrictive_which_attaches_to_nearest_np():
    # 'which' cannot take a human antecedent — the company holds
    assert ("W.R-Grace-&-Co", "hold", "interest", "pos") in triples_of(
        "J.P. Bolduc, vice chairman of W.R. Grace & Co., which holds a "
        "83.4% interest in this energy-services company, was elected a "
        "director.")


# --- second code-review pass (round 3) regression cases ----------------------


def test_conclude_verb_survives_lexicon_dedupe():
    assert ("report", "conclude", "study", "pos") in triples_of(
        "The report concludes the study.")


def test_quotative_parenthetical_keeps_matrix_subject():
    ts = triples_of("The patch that failed, says Bob, will be reverted.")
    assert ("Bob", "say", "fail", "pos") in ts
    assert ("", "revert", "patch", "pos") in ts  # continuation not stolen


def test_noun_noun_noun_compound_not_verbified():
    ts = triples_of("Interest rates policy stayed tight.")
    assert ("policy", "stay", "tight", "pos") in ts
    assert ("interest", "rate", "policy", "pos") not in ts


def test_embedded_complement_inside_relative():
    ts = triples_of("The patch that Bob claimed Alice wrote failed.")
    assert {("Bob", "claim", "write", "pos"),
            ("Alice", "write", "patch", "pos"),
            ("patch", "fail", "", "pos")} <= ts


def test_generic_double_object_verb():
    assert {("she", "ask", "he", "pos"),
            ("she", "ask", "question", "pos")} <= triples_of(
        "She asked him a question.")


def test_speculative_parses_leak_no_ghost_facts():
    # reverted speculative parses must roll back nmod/aka too — a leaked
    # copy would surface twice with empty refs
    from collections import Counter
    for s in ("After Mr. Smith, a director of Acme, resigned, the board met.",
              "Bob, a friend of Mary, a teacher, went home."):
        _, ts = extract_sentence(s)
        flat = [(t.subj, t.pred, t.obj) for t in ts]
        dups = {k: v for k, v in Counter(flat).items() if v > 1}
        assert not dups, (s, dups)
        assert all(t.subj_ref or not t.subj for t in ts), s


def test_row_level_failure_isolation(monkeypatch):
    """SURVEY A4: one malformed turn emits a queryable '_error' mention
    row instead of aborting the batch (reference dead-letter semantics)."""
    import pandas as pd
    import ie_spark.extraction.pandas_api as papi

    real = papi.extract_turn

    def boom(text):
        if text == "POISON":
            raise ValueError("boom")
        return real(text)

    monkeypatch.setattr(papi, "extract_turn", boom)
    pdf = pd.DataFrame({"conv_id": ["c", "c"], "turn_idx": [0, 1],
                        "text": ["Alice reviewed the patch.", "POISON"]})
    mentions, triples = papi.extract_batch(pdf)
    assert ("Alice" in set(mentions.stem))
    err = mentions[mentions.kind == "_error"]
    assert len(err) == 1 and err.iloc[0]["stem"] == "ValueError"
    assert err.iloc[0]["turn_idx"] == 1
    # the healthy turn's triples survive
    assert ("Alice", "review", "patch") in {
        (r.subj, r.pred, r.obj) for r in triples.itertuples()}


def test_predicative_of_pp_distributes_over_coordination():
    # all three nmod attachment sites distribute a PP over coordinated
    # NP members, including the predicative-adjective branch
    ts = triples_of("The room is free of smoke and dust.")
    assert ("free", "of", "smoke", "pos") in ts
    assert ("free", "of", "dust", "pos") in ts


def test_particle_object_temporal_nps_are_adverbial():
    # 'picked up last quarter' attaches with role ADV (the bare-date
    # convention), never as an ARG1 direct object; genuine objects
    # starting with this/every/each still attach as ARG1
    def roles(sentence):
        _, ts = extract_sentence(sentence)
        return {(t.subj, t.pred, t.obj, t.role) for t in ts}
    assert ("Sales", "pick", "quarter", "ADV") in roles(
        "Sales picked up last quarter.")
    assert ("team", "give", "time", "ADV") in roles(
        "The team gave up three times.")
    assert ("virus", "wipe", "file", "ARG1") in roles(
        "The virus wiped out every file.")
    assert ("she", "look", "word", "ARG1") in roles(
        "She looked up this word in the dictionary.")


def test_particle_object_counts_as_complete_for_gap_check():
    # the particle object's role carries no prep, so the noun-complement
    # clause is complete and no spurious gap triple attaches
    ts = triples_of("She reported signs that the team gave up the lead.")
    assert ("team", "give", "lead", "pos") in ts
    assert ("team", "give", "sign", "pos") not in ts


def test_passive_by_temporal_noun_is_deadline_not_agent():
    for s, obj in [("The invoice must be paid by midnight.", "invoice"),
                   ("The report must be submitted by the deadline.",
                    "report"),
                   ("The fee was waived by the end of the month.", "fee")]:
        ts = triples_of(s)
        assert any(t[0] == "" and t[2] == obj for t in ts), (s, ts)


def test_oblique_no_does_not_negate_clause():
    # 'finished with no errors' asserts the finish happened, but a
    # sole-complement oblique ('spoke to no one') IS clause-negating
    ts = triples_of("The migration finished with no errors.")
    assert ("migration", "finish", "error", "pos") in ts
    ts = triples_of("He spoke to no one.")
    assert ("he", "speak", "one", "neg") in ts


def test_irregular_participle_passives():
    # 'done' is a main-verb participle, not an auxiliary; irregular
    # participles take by-agents like regular ones
    assert ("Alice", "do", "work", "pos") in triples_of(
        "The work was done by Alice.")
    assert ("police", "catch", "thief", "pos") in triples_of(
        "The thief was caught by the police.")
    # temporal 'by time' stays a deadline-style adjunct
    assert ("", "do", "damage", "pos") in triples_of(
        "The damage was done by time.")


def test_elliptical_participle_after_as_than_stays_verbal():
    ts = triples_of("The system works as designed.")
    assert ("system", "work", "", "pos") in ts
    # no fabricated oblique ('system', 'work', 'designed')
    assert not any(o == "designed" for _, _, o, _ in ts)
