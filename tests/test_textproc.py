"""Reference-exact text kernels (citations in the impl docstrings)."""

from search_engine_ray.functions.textproc import (
    clean_word,
    extract_plaintext,
    join_article_text,
    split_whitespace,
    synthesize_html,
)


class TestExtractPlaintext:
    def test_strips_tags(self):
        assert extract_plaintext("<p>hello</p> world") == "hello world"

    def test_nongreedy_single_tag(self):
        # <[^>]*> matches each tag separately, not across them
        assert extract_plaintext("<a><b>x</b></a>") == "x"

    def test_empty_tag_stripped(self):
        assert extract_plaintext("a<>b") == "ab"

    def test_unclosed_angle_kept(self):
        assert extract_plaintext("a < b") == "a < b"

    def test_attributes(self):
        assert extract_plaintext('<a href="u" x=1>t</a>') == "t"

    def test_join_article_text(self):
        # sentences joined with "", paragraphs with "\n\n" (indexer.rs:59-63)
        text = join_article_text([["s1.", "s2."], ["p2."]])
        assert text == "s1.s2.\n\np2."

    def test_synthesize_roundtrip(self):
        for text in [
            "hello world",
            "para one\n\npara two\n\nthree",
            "",
            "a  b\tc",
            "ünïcode café",
        ]:
            assert extract_plaintext(synthesize_html(text)) == text


class TestCleanWord:
    def test_lowercases(self):
        assert clean_word("Apple") == "apple"
        assert clean_word("APPLE") == "apple"

    def test_strips_punct_both_ends(self):
        assert clean_word("(hello)") == "hello"
        assert clean_word("world!") == "world"
        assert clean_word('"quoted."') == "quoted"

    def test_keeps_interior_punct(self):
        assert clean_word("test-case") == "test-case"
        assert clean_word("version2.0") == "version2.0"

    def test_punct_only_empty(self):
        assert clean_word(",,,") == ""
        assert clean_word("!!!") == ""
        assert clean_word("") == ""

    def test_unicode_alnum(self):
        assert clean_word("café") == "café"
        assert clean_word("«naïve»") == "naïve"
        # unicode punctuation/symbols trimmed, digits kept
        assert clean_word("…data42…") == "data42"

    def test_digits(self):
        assert clean_word("123") == "123"
        assert clean_word("+123-") == "123"


class TestSplitWhitespace:
    def test_no_empties(self):
        assert split_whitespace("  a   b \t c \n ") == ["a", "b", "c"]

    def test_empty(self):
        assert split_whitespace("") == []
        assert split_whitespace("   ") == []


class TestLemmaFileParser:
    def test_reference_format(self, tmp_path):
        # the reference's lemmas.txt line format (tokenizer.rs:52-87)
        p = tmp_path / "lemmas.txt"
        p.write_text(
            'be,"is, was, are"\n'
            "\n"
            'run,"ran, running"\n'
            'be,"am"\n'          # later lines overwrite
            "noquotes,x, y\n"    # quotes optional; split at FIRST comma
        )
        from search_engine_ray.functions.lemmas import parse_lemma_file

        m = parse_lemma_file(str(p))
        assert m["is"] == "be" and m["was"] == "be" and m["am"] == "be"
        assert m["running"] == "run"
        assert m["x"] == "noquotes" and m["y"] == "noquotes"
