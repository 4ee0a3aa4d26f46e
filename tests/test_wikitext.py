r"""Wiki-markup converter conformance (doctest corpora ported verbatim
from the reference grammar modules — FIXTURES.md §6):
tiddlywiki.py:210-294, zim.py:19-51, zettelkasten.py:147-183,
roam_research.py:124-160, colornote.py:19-29."""

import pytest

from jimmy_ray.md.wikitext import (
    bbcode_to_md,
    colornote_to_md,
    roam_to_md,
    tiddlywiki_to_md,
    zim_to_md,
)

TIDDLYWIKI_CASES = [
    ("Double single quotes are used for ''bold'' text",
     "Double single quotes are used for **bold** text"),
    ("!! //italic heading//", "## *italic heading*"),
    ("''only bold text followed by: //bold and italic text//''",
     "**only bold text followed by: *bold and italic text***"),
    ("//italic text://", "*italic text:*"),
    ("from http://127.0.0.1/MyApp to default http://127.0.0.1/.",
     "from http://127.0.0.1/MyApp to default http://127.0.0.1/."),
    ("! level 1 heading!\n!!!!!! level 6! heading",
     "# level 1 heading!\n###### level 6! heading"),
    ("<<<\nThis is a block quoted paragraph\nwritten in English\n<<<",
     "\n> This is a block quoted paragraph\n> written in English"),
    ("<<<\nComputers are like a bicycle for our minds\n<<< S. Jobs",
     "\n> Computers are like a bicycle for our minds\n> *S. Jobs*"),
    ("> Quoted text\n> Another line of quoted text",
     "> Quoted text\n> Another line of quoted text"),
    ("* -- n-dash\n* --- m-dash --- example\n----",
     "* – n-dash\n* — m-dash — example\n---"),
    ("----\n---", "---\n---"),
    ("[img[Motovun Jack.jpg]]", "![Motovun Jack.jpg](Motovun Jack.jpg)"),
    ("[img[https://tiddlywiki.com/favicon.ico]]",
     "![https://tiddlywiki.com/favicon.ico](https://tiddlywiki.com/favicon.ico)"),
    ("[img[An explanatory tooltip|Motovun Jack.jpg]]",
     "![An explanatory tooltip](Motovun Jack.jpg)"),
    ("abc [img[a|b.jpg]] def", "abc ![a](b.jpg) def"),
    ("[img width=32 class='tc-image' [Motovun Jack.jpg]]",
     "![Motovun Jack.jpg](Motovun Jack.jpg)"),
    ("link to [[Tiddler Title]]",
     "link to [Tiddler Title](tiddlywiki://Tiddler Title)"),
    ("[[Displayed Link Title|Tiddler Title]]",
     "[Displayed Link Title](tiddlywiki://Tiddler Title)"),
    ("abc [[TW5|https://tiddlywiki.com/]]", "abc [TW5](https://tiddlywiki.com/)"),
    ("[[Mail me|mailto:me@where.net]] def", "[Mail me](mailto:me@where.net) def"),
    ("[[mailto:me@where.net]] def",
     "[mailto:me@where.net](mailto:me@where.net) def"),
    ("[[Open file|file:///c:/users/me/index.html]]",
     "[Open file](file:///c:/users/me/index.html)"),
    ("[ext[Open file|index.html]]", "[Open file](index.html)"),
    ("abc [ext[Open file|./index.html]]", "abc [Open file](./index.html)"),
    ("[ext[Open file|../README.md]] def", "[Open file](../README.md) def"),
    ("[ext[Open file|../README Space.md]] def",
     "[Open file](<../README Space.md>) def"),
    ("[ext[Open file|c:\\users\\me\\index.html]]",
     "[Open file](<c:\\users\\me\\index.html>)"),
    ("[ext[https://www.bvb.de/]]", "[https://www.bvb.de/](https://www.bvb.de/)"),
    ("text1 [[title 1|link 1]] text2 [[link2]] text3",
     "text1 [title 1](tiddlywiki://link 1) text2 [link2](tiddlywiki://link2) text3"),
    ("`[]`, [[Links|Links]], [[Filters|Filters]]",
     "`[]`, [Links](tiddlywiki://Links), [Filters](tiddlywiki://Filters)"),
    ("* First item\n* Second item\n** Subitem\n* Third list item",
     "* First item\n* Second item\n    * Subitem\n* Third list item"),
    ("# Step 1\n# Step 2\n## Step2.1\n# Step 3",
     "1. Step 1\n1. Step 2\n    1. Step2.1\n1. Step 3"),
    ("* Do today\n*# Eat\n* To do\n*# This\n*# That\n*## Other",
     "* Do today\n    1. Eat\n* To do\n    1. This\n    1. That\n        1. Other"),
    ("* One\n** Two\n**> A quote\n**> Another quote\n* List Three",
     "* One\n    * Two\n        > A quote\n        > Another quote\n* List Three"),
    ("|!Cell1 |!Cell2 |\n|Cell3 |Cell4 |\n",
     "| Cell1 | Cell2 |\n| --- | --- |\n| Cell3 | Cell4 |\n"),
    ("|C1 |C2 |C3 |\n|C4 |C5 |<|\n|C6 |~|C7 |\n|>|C8 |C9 |\n",
     "| C1 | C2 | C3 |\n| --- | --- | --- |\n| C4 | C5 |  |\n"
     "| C6 |  | C7 |\n|  | C8 | C9 |\n"),
    ("|^t l |^t c |^ t r|\n|m l |m c | m r|\n|,b l |, b c |,b r|\n",
     "| t l | t c | t r |\n| --- | --- | --- |\n| m l | m c | m r |\n"
     "| b l | b c | b r |\n"),
    ("|cls|k\n|caption |c\n|C1 |C2|\n|C3|C4 |\n|H1|H2|h\n|F1|F2|f\n",
     "caption\n\n| H1 | H2 |\n| --- | --- |\n| C1 | C2 |\n| C3 | C4 |\n"
     "| F1 | F2 |\n"),
    ("- ''modifier''\n- __underlined__", "- **modifier**\n- ++underlined++"),
    ("|C1 |''modifier''|\n", "| C1 | **modifier** |\n| --- | --- |\n"),
]

ZIM_CASES = [
    ("''monospace'' **bold**", "`monospace` **bold**"),
    ("super^{script}, sub_{script}", "super^script^, sub~script~"),
    ("====== heading 1 ======", "# heading 1"),
    ("== heading5 ==", "##### heading5"),
    ("**__highlighted and bold__**", "**==highlighted and bold==**"),
    ("'''\nsome code\nblock\n'''", "```\nsome code\nblock\n```"),
    ("[ ] unchecked\n[x] not done", "- [ ] unchecked\n- [x] not done"),
    ("[ ] u\n    [>] np\n    [*] nd\n[x] nd",
     "- [ ] u\n    - [ ] np\n    - [x] nd\n- [x] nd"),
    ("* lvl1\n\t* lvl2\n\t* lvl2\n* lvl1",
     "* lvl1\n    * lvl2\n    * lvl2\n* lvl1"),
    ("{{./image.png}}", "![image.png](image.png)"),
    ("{{./image.png?width=600}}", "![image.png](image.png)"),
    ("[[#heading3|heading3]]", "[heading3](#heading3)"),
    ("[[https://www.bvb.de/|TITLE ''monospace'']]",
     "[TITLE `monospace`](https://www.bvb.de/)"),
    ("[[./0.mp3]]", "[./0.mp3](0.mp3)"),
]

BBCODE_CASES = [
    ("[f]fett[/f]", "**fett**"),
    ("das ist [d]durchgestrichener[/d] text",
     "das ist ~~durchgestrichener~~ text"),
    ("[h #ffff00]colored[/h] text", "==colored== text"),
    ("[h3]heading 3[/h3]", "### heading 3"),
    ("some[br]li nes[br]he re", "some\nli nes\nhe re"),
    ("[q]single line quote[/q]", "> single line quote"),
    ("disappearing [al]tag[/al]", "disappearing tag"),
    ("[code]some code[/code]", "\n```\nsome code\n```"),
    ("[code]long[br]code block[/code]", "\n```\nlong\ncode block\n```"),
    ("[img]some image.png[/img]", "![some image.png](some image.png)"),
    ("link [z 3]zu Zettel 3[/z]", "link [zu Zettel 3](note://3)"),
    ("[table][tc]Test Table[/tc][br]h 1^h 2^h3[br]d1 |d 2 |d3[/table]",
     "Test Table\n\n| h 1 | h 2 | h3 |\n| --- | --- | --- |\n| d1  | d 2  | d3 |"),
    ("[table]h 1^h 2^h3[br][f]fett[/f] |d 2 |d3[/table]",
     "| h 1 | h 2 | h3 |\n| --- | --- | --- |\n| **fett**  | d 2  | d3 |"),
    ("[l][*]Here an item[/*][*]Other [d]item[/d]![/*][/l]",
     "* Here an item\n* Other ~~item~~!\n"),
    ("[n][*]Numbered item[/*][*]Other numbered item![/*][/n]",
     "1. Numbered item\n1. Other numbered item!\n"),
]

ROAM_CASES = [
    ("^^highlighted^^", "==highlighted=="),
    ("__^^highlighted and italic^^ italic only__",
     "*==highlighted and italic== italic only*"),
    ("#tag #[[another tag]]", "#tag #another-tag"),
    ("- {{[[TODO]]}} check\n- {{[[DONE]]}} list", "- [ ] check\n- [x] list"),
    ("> citation 1\n[[>]] citation 2", "> citation 1\n> citation 2"),
    ("[link to page]([[Theme Tester]])", "[link to page](roam-page://Theme Tester)"),
    ("[link to block](((JF3iFJPKu)))", "[link to block](roam-block://JF3iFJPKu)"),
    ("[[link to page]]", "[link to page](roam-page://link to page)"),
    ("[[August 5th, 2023]]", "[August 5th, 2023](roam-page://August 5th, 2023)"),
    ("embedded block: {{[[embed]]: ((sHQRa0Wan))}}",
     "embedded block: [sHQRa0Wan](roam-block://sHQRa0Wan)"),
    ("embedded page: {{[[embed]]: [[testing]]}}",
     "embedded page: [testing](roam-page://testing)"),
    ("mentioned page: {{[[mentions]]: [[White Paper]]}}",
     "mentioned page: [White Paper](roam-page://White Paper)"),
    ("{{[[slider]]}}", "{{[[slider]]}}"),
    ("{{[[table]]}}", "{{[[table]]}}"),
    ("((aaa))", "((aaa))"),
    ("{{[[pdf]]: https://some.url/abc.pdf}}", "<https://some.url/abc.pdf>"),
]

COLORNOTE_CASES = [
    ("[V] A\n[V] B", "- [x] A\n- [x] B"),
    ("[ ] Item 1\n[ ] Item 2\n[ ] Item 3",
     "- [ ] Item 1\n- [ ] Item 2\n- [ ] Item 3"),
]


@pytest.mark.parametrize("src,expected", TIDDLYWIKI_CASES,
                         ids=range(len(TIDDLYWIKI_CASES)))
def test_tiddlywiki(src, expected):
    assert tiddlywiki_to_md(src) == expected


@pytest.mark.parametrize("src,expected", ZIM_CASES, ids=range(len(ZIM_CASES)))
def test_zim(src, expected):
    assert zim_to_md(src) == expected


@pytest.mark.parametrize("src,expected", BBCODE_CASES, ids=range(len(BBCODE_CASES)))
def test_bbcode(src, expected):
    assert bbcode_to_md(src) == expected


@pytest.mark.parametrize("src,expected", ROAM_CASES, ids=range(len(ROAM_CASES)))
def test_roam(src, expected):
    assert roam_to_md(src) == expected


@pytest.mark.parametrize("src,expected", COLORNOTE_CASES,
                         ids=range(len(COLORNOTE_CASES)))
def test_colornote(src, expected):
    assert colornote_to_md(src) == expected


def test_tw_split_tags_edges():
    from jimmy_ray.md.wikitext import tw_split_tags

    assert tw_split_tags("tag1 tag2 [[tag with spaces]]") == [
        "tag1", "tag2", "tag with spaces"]
    # unterminated bracket (truncated/hand-edited export): tag kept
    assert tw_split_tags("alpha [[work notes") == ["alpha", "work notes"]
    # empty bracket pair never corrupts the following tag
    assert tw_split_tags("[[]] beta") == ["beta"]
    assert tw_split_tags("  ") == []
