#!/usr/bin/env python3
"""Generate the frozen WordPiece golden case file (SURVEY §7.4.7).

INDEPENDENT reimplementation of the published BERT tokenizer
(google-research/bert tokenization.py semantics, the algorithm HF
BertTokenizer runs for hfl/chinese-roberta-wwm-ext) on Python's
unicodedata — a different Unicode engine than the JVM the Scala
expression uses, so a frozen agreement between the two pins the
algorithm, not a shared bug.

The real 21,128-entry vocab file is a network artifact and cannot be
fetched here; the slice below reconstructs its STRUCTURE from public
knowledge instead: [PAD]=0, [unused1..99] filling 1..99, [UNK]=100,
[CLS]=101, [SEP]=102, [MASK]=103 (the BERT-Chinese header layout),
then punctuation / digits / latin letters+pieces / CJK singles —
the same shape, so the real file drops into the expression unchanged.

Usage: python3 tools/wordpiece_golden.py   (writes the two files under
src/test/resources/; outputs are committed — regenerate only when the
case list changes, and expect the spec to agree either way)
"""
import json
import os
import unicodedata

MAX_CHARS_PER_WORD = 100  # HF WordpieceTokenizer default


def _is_whitespace(ch):
    if ch in " \t\n\r":
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch):
    if ch in "\t\n\r":
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch):
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_chinese_char(cp):
    return ((0x4E00 <= cp <= 0x9FFF) or (0x3400 <= cp <= 0x4DBF) or
            (0x20000 <= cp <= 0x2A6DF) or (0x2A700 <= cp <= 0x2B73F) or
            (0x2B740 <= cp <= 0x2B81F) or (0x2B820 <= cp <= 0x2CEAF) or
            (0xF900 <= cp <= 0xFAFF) or (0x2F800 <= cp <= 0x2FA1F))


def _clean_text(text):
    out = []
    for ch in text:
        cp = ord(ch)
        if cp == 0 or cp == 0xFFFD or _is_control(ch):
            continue
        out.append(" " if _is_whitespace(ch) else ch)
    return "".join(out)


def _tokenize_chinese_chars(text):
    out = []
    for ch in text:
        if _is_chinese_char(ord(ch)):
            out.append(" ")
            out.append(ch)
            out.append(" ")
        else:
            out.append(ch)
    return "".join(out)


def _run_strip_accents(text):
    return "".join(ch for ch in unicodedata.normalize("NFD", text)
                   if unicodedata.category(ch) != "Mn")


def _run_split_on_punc(text):
    chars = list(text)
    out, cur = [], []
    for ch in chars:
        if _is_punctuation(ch):
            if cur:
                out.append("".join(cur))
                cur = []
            out.append(ch)
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out


def basic_tokenize(text, lower=True):
    text = _clean_text(text)
    text = _tokenize_chinese_chars(text)
    split = []
    for tok in text.split():
        if lower:
            tok = _run_strip_accents(tok.lower())
        split.extend(_run_split_on_punc(tok))
    return " ".join(split).split()


def wordpiece(word, vocab_ids, unk_id):
    if len(word) > MAX_CHARS_PER_WORD:
        return [unk_id]
    pieces, start = [], 0
    while start < len(word):
        end, found = len(word), None
        while end > start:
            sub = ("##" if start > 0 else "") + word[start:end]
            if sub in vocab_ids:
                found = vocab_ids[sub]
                break
            end -= 1
        if found is None:
            return [unk_id]
        pieces.append(found)
        start = end
    return pieces


def tokenize(text, vocab_ids):
    ids = [vocab_ids["[CLS]"]]
    for w in basic_tokenize(text):
        ids.extend(wordpiece(w, vocab_ids, vocab_ids["[UNK]"]))
    ids.append(vocab_ids["[SEP]"])
    return ids


# ---------------------------------------------------------------- vocab
VOCAB = (
    ["[PAD]"] + [f"[unused{i}]" for i in range(1, 100)] +
    ["[UNK]", "[CLS]", "[SEP]", "[MASK]"] +
    list("!\"#$%&'()*+,-./:;<=>?@[\\]^_`{|}~") +
    list("，。！？、：；（）《》“”‘’·—…") +
    list("0123456789") + ["##" + d for d in "0123456789"] +
    list("abcdefghijklmnopqrstuvwxyz") +
    ["##" + c for c in "abcdefghijklmnopqrstuvwxyz"] +
    list("的一是在不了有大人这中国上为们我他来时学生会年好你她它吗"
         "天气很今明日月水火山口心手电视影音乐新闻网络游戏体育财经"
         "房产汽车教科技美食旅行世界动漫画片段频标题封面图文字幕播"
         "放量点赞评论分享收藏作者用户内容平台推荐热门搜索直间小哥"
         "姐弟妹妈爸家庭宠物猫狗鱼鸟花草树木春夏秋冬雨雪风云星空海"
         "洋河流城市乡村北京沪广州深圳成都重庆西安南武汉杭三峡坝") +
    ["the", "to", "of", "and", "in", "it", "you", "that", "for", "on",
     "with", "this", "from", "what", "how", "can", "will", "about",
     "istanbul", "play", "##ing", "##ed", "##er", "##ly",
     "##est", "##tion", "##al", "video", "game", "news", "live",
     "stream", "cat", "dog", "food", "travel", "tech", "sport",
     "music", "movie", "anime", "phone", "iphone", "cafe", "email",
     "mail", "don", "token", "word", "piece", "trans", "##form",
     "##ormer", "bert", "model", "data"] +
    ["𠀀"]  # astral-plane ideograph (U+20000) — single token
)

# ---------------------------------------------------------------- cases
CASES = [
    # pure CJK runs: every ideograph its own token
    "三峡大坝", "今天天气很好", "我们在学校", "中国新闻网",
    # mixed script + digits: greedy ## continuation inside latin runs
    "中国iPhone手机，NEWS！", "玩game的人很多", "2023年3月15日",
    "b站video播放量99万", "视频标题：《三体》第1集",
    # ASCII symbol ranges ARE punctuation ($ = + ~ ^ | < >)
    "price=$99+tax", "a+b=c", "1<2>0", "x^2|y~z",
    # NON-ASCII symbols are NOT punctuation: word sinks to [UNK]
    "price€99", "温度25°c", "thumbs👍up",
    # format chars (ZWJ/ZWNJ, Cf) are REMOVED by clean_text
    "play‍ing", "ab‌cd", "菜‍单",
    # control chars removed; NBSP (Zs) IS whitespace
    "play\x07ing", "hello world", "full width spaces",
    # accents strip after lowercase; Locale-proof İ
    "Café", "CAFÉ EMAIL", "İstanbul", "naïve", "crème brûlée",
    # punctuation splits (hyphen, apostrophe, CJK full-width)
    "e-mail", "don't", "（直播间）热门推荐！", "标题——副标题…",
    "什么？！", "一、二、三。",
    # greedy longest-match and whole-word [UNK] fallback
    "playing", "played", "player", "plays", "transformer",
    "transformational", "wordpiece", "tokenization", "zzzqqq",
    "playingzzz", "数据data模型model",
    # long-word guard: 100 chars tokenizes, 101 chars -> [UNK]
    "a" * 100, "a" * 101, "好" + "b" * 100,
    # astral plane: in-vocab U+20000, out-of-vocab U+20001
    "𠀀", "𠀁", "字𠀀字",
    # unknown BMP ideograph between known ones -> per-char [UNK]
    "三龘峡", "龘",
    # empty / whitespace-only -> bare [CLS][SEP]
    "", "   ", "\t\n",
    # digits and punctuation runs
    "3.14159", "1,000,000", "100%", "50:50",
    # realistic reference-style titles (video classification corpus)
    "【美食】深圳最好吃的火锅店top10！",
    "宠物猫vs狗：谁更可爱？2023年投票",
    "《王者荣耀》s30赛季上分攻略（直播回放）",
    "旅行vlog：成都-重庆3日游，人均500元",
]


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    res = os.path.join(here, "..", "src", "test", "resources")
    vocab_ids = {w: i for i, w in enumerate(VOCAB)}
    assert len(vocab_ids) == len(VOCAB), "duplicate vocab entry"
    assert vocab_ids["[UNK]"] == 100 and vocab_ids["[CLS]"] == 101 \
        and vocab_ids["[SEP]"] == 102 and vocab_ids["[MASK]"] == 103, \
        "BERT-Chinese header layout drifted"
    with open(os.path.join(res, "wordpiece_vocab_bertzh_slice.txt"), "w") as f:
        for w in VOCAB:
            f.write(w + "\n")
    with open(os.path.join(res, "wordpiece_golden_cases.jsonl"), "w") as f:
        for text in CASES:
            ids = tokenize(text, vocab_ids)
            f.write(json.dumps({"text": text, "ids": ids},
                               ensure_ascii=False) + "\n")
    print(f"vocab {len(VOCAB)} entries, {len(CASES)} cases written")


if __name__ == "__main__":
    main()
