"""Paragraph -> sentence segmentation (text/segment.py)."""

from daft_exprt_tpu.text.segment import split_paragraph


def test_basic_split():
    assert split_paragraph("Hello there. How are you? Fine!") == [
        "Hello there.", "How are you?", "Fine!"]


def test_abbreviations_and_initials_do_not_split():
    assert split_paragraph("Dr. Smith met Mr. Jones. They left.") == [
        "Dr. Smith met Mr. Jones.", "They left."]
    assert split_paragraph("J. K. Rowling wrote it. Read it.") == [
        "J. K. Rowling wrote it.", "Read it."]


def test_numbers_do_not_split():
    assert split_paragraph("Pi is 3.14 exactly. Almost.") == [
        "Pi is 3.14 exactly.", "Almost."]


def test_quotes_stay_with_sentence():
    assert split_paragraph('He said "stop." Then ran.') == [
        'He said "stop."', "Then ran."]


def test_ellipsis_and_runs():
    assert split_paragraph("Wait... What?! Yes.") == [
        "Wait...", "What?!", "Yes."]


def test_phonemized_braces_never_split():
    text = "{HH AH0 L OW1} {W ER1 L D}. {DH IH1 S} {IH1 Z}."
    assert split_paragraph(text) == [
        "{HH AH0 L OW1} {W ER1 L D}.", "{DH IH1 S} {IH1 Z}."]
    # punctuation inside braces is ARPAbet context, not a boundary
    assert split_paragraph("{AH0 . B}") == ["{AH0 . B}"]


def test_no_final_punctuation_kept():
    assert split_paragraph("no punctuation at all") == [
        "no punctuation at all"]
    assert split_paragraph("First one. trailing tail") == [
        "First one.", "trailing tail"]


def test_empty_and_whitespace():
    assert split_paragraph("") == []
    assert split_paragraph("   ") == []


def test_single_sentence_identity():
    assert split_paragraph("Just one sentence.") == [
        "Just one sentence."]
