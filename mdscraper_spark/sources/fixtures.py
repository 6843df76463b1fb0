"""Deterministic fixture corpus + Common-Crawl-shaped pages synthesizer.

Implements FIXTURES.md §1: the fixture HTML bodies replay the
reference's own test inputs (/root/reference/tests/test_mdscraper.py:28-48,
:228-243; /root/reference/tests/test_empty_lines_fix.py:21-67) plus
minimal pages exercising each cascade stage and quirk.  The bulk
generator emits Zipf-skewed hosts (hub domains) so partitioning/salting
is exercised, and seeds entity/relation sentences so the KG back end
has deterministic ground truth.

Everything is seeded — same inputs at every scale, no external data.
"""

from __future__ import annotations

import datetime
import random
from typing import Dict, Iterator, List, Tuple

from mdscraper_spark.config import ExtractConfig

# ---------------------------------------------------------------------------
# fixture cases (FIXTURES.md §1.1)
# ---------------------------------------------------------------------------

ARTICLE_BASIC = """
<!DOCTYPE html>
<html>
<head>
    <title>Test Page</title>
</head>
<body>
    <div class="ads">SPONSORED CONTENT</div>
    <nav id="nav"><a href="/home">Home</a></nav>
    <article class="content">
        <h1>Test Article</h1>
        <p>This is a test paragraph.</p>
        <img src="test.jpg" alt="Test Image">
        <p>Another paragraph with <a href="https://example.com">a link</a>.</p>
        <h2>Section Heading</h2>
        <p>Content in a section.</p>
        <p><img src="section.jpg" alt="Section Image"></p>
        <h3>Subsection</h3>
        <p>More content.</p>
    </article>
</body>
</html>
"""

DIV_CONTENT_IMAGES = """
<!DOCTYPE html>
<html>
<body>
    <div class="content">
        <h1>Test</h1>
        <p>Text before image</p>
        <p><img src="test.jpg" alt="Test"></p>
        <p></p>
        <p>Text after image</p>
        <p><img src="test2.jpg" alt="Test2"></p>
        <p>More text</p>
    </div>
</body>
</html>
"""

EMPTY_LINES = """
<!DOCTYPE html>
<html>
<head><title>Test Empty Lines</title></head>
<body>
    <div class="content">
        <h1>Test Document</h1>
        <p>This is a paragraph before an image.</p>
        <p><img src="image1.jpg" alt="Image 1"></p>
        <p>This is a paragraph between two images.</p>
        <p><img src="image2.jpg" alt="Image 2"></p>
        <p></p>
        <p>This is a paragraph after an empty paragraph.</p>
        <div>
            <img src="image3.jpg" alt="Image 3">
        </div>
        <p>Text after a div with only an image.</p>
        <p>
            Some text with an inline image: <img src="inline.jpg" alt="Inline"> and more text.
        </p>
        <h2>Multiple Empty Paragraphs</h2>
        <p><img src="multiple1.jpg" alt="Multiple 1"></p>
        <p></p>
        <p></p>
        <p></p>
        <p>Text after multiple empty paragraphs and an image.</p>
        <p>Final paragraph.</p>
    </div>
</body>
</html>
"""

LINKS_BASIC = """
<html>
    <body>
        <div class="content">
            <h1>Links</h1>
            <p><a href="/page1.html">Page 1</a></p>
            <p><a href="/page2.html">Page 2</a></p>
        </div>
    </body>
</html>
"""

LINKS_EXCLUDED = """
<html>
    <body>
        <div class="content">
            <p><a href="/page1.html">Page 1</a></p>
            <p><a href="/excluded-page.html">Excluded Page</a></p>
            <p><a href="/ignore-this-page.html">Ignored Page</a></p>
        </div>
    </body>
</html>
"""

LINKS_MIXED = """
<html>
    <body>
        <div class="content">
            <p><a href="/page1.html">Page 1</a></p>
            <p><a href="https://example.com/page2.html">Page 2</a></p>
        </div>
    </body>
</html>
"""

LINKS_NONE = """
<html>
    <body>
        <div class="content">
            <p>No links here!</p>
        </div>
    </body>
</html>
"""

ID_CONTAINER = """
<html>
<body>
    <div id="content-wrapper"><p>decoy: id must not substring-match</p></div>
    <div class="sidebar"><p>decoy sidebar with quite a lot of text in it</p></div>
    <div id="main-content">
        <h1>Id Match</h1>
        <p>Found by the hand-rolled id scan.</p>
    </div>
</body>
</html>
"""

LARGEST_DIV = """
<html>
<body>
    <span>nothing named matches here</span>
    <div><p>alpha alpha alpha</p></div>
    <div><p>beta beta beta b</p></div>
    <div><p>tiny</p></div>
</body>
</html>
"""

TITLE_FALLBACK_TITLE = """
<html>
<head><title>Only A Title Tag</title></head>
<body><div class="content"><p>body text</p></div></body>
</html>
"""

TITLE_FALLBACK_NONE = """
<html>
<body><div class="content"><p>anonymous page</p></div></body>
</html>
"""

QUIRKS = """
<html>
<body>
    <div class="content">
        <h1>Quirky &nbsp; Title&#10;Here</h1>
        <p>A heading with # inner # hashes below.</p>
        <h2>Sub # heading # marks</h2>
        <p><a href="https://fixtures.test/docs/a/docs/b.html">repeat root</a></p>
        <p>Entities: 3 &lt; 5 &amp; true.</p>
    </div>
</body>
</html>
"""

CUSTOM_CONTAINER = """
<html>
<body>
    <div class="content"><p>default-name decoy that would normally win</p></div>
    <div class="custom-name">
        <h1>Custom Zone</h1>
        <p>picked only with --content custom-name</p>
    </div>
</body>
</html>
"""

# -- hostile-HTML envelope (round 3) ----------------------------------------
# Malformed/adversarial structures the reference meets on the real web
# (bs4 html.parser tolerates them all; its builder does NO implicit
# closes — nested <li>/<p> chains stay nested, end tags pop to the
# nearest matching open tag, unmatched end tags are ignored — exactly
# the _TreeBuilder contract in htmlcore/dom.py).  Frozen as goldens so
# the tolerated-input envelope is regression-pinned, not just
# crash-safe (fuzz).  Outputs hand-reviewed once at freeze time.

HOSTILE_COMMENTS = """
<html>
<body>
    <div class="content">
        <h1>Comments</h1>
        <!-- a plain comment -->
        <p>before<!-- inline comment -->after</p>
        <!-- <div class="content"><p>decoy inside comment</p></div> -->
        <p>done</p>
    </div>
</body>
</html>
"""

HOSTILE_SCRIPT_CDATA = """
<html>
<head><title>Script Soup</title>
<script>if (a < b && c > d) { document.write("<p>injected</p>"); }</script>
<style>.x > .y { color: red; } /* </style> tricks end here */</style>
</head>
<body>
    <div class="content">
        <h1>Real</h1>
        <script>//<![CDATA[
          var html = "<div class='content'>fake</div>";
        //]]></script>
        <p>visible text</p>
    </div>
</body>
</html>
"""

HOSTILE_MISNEST = """
<html>
<body>
    <div class="content">
        <h1>Misnest</h1>
        <p><b>bold <i>both</b> italic tail</i> plain</p>
        <span>before<div><p>block in span</p></div>after</span>
    </div>
</body>
</html>
"""

HOSTILE_IMPLICIT_CLOSE = """
<html>
<body>
    <div class="content">
        <h1>Lists</h1>
        <ul>
            <li>one
            <li>two
            <li>three
        </ul>
        <p>first para
        <p>second para
        <ol>
            <li>outer
            <ul><li>inner a<li>inner b</ul>
            <li>outer two
        </ol>
    </div>
</body>
</html>
"""

HOSTILE_ENTITIES = """
<html>
<body>
    <div class="content">
        <h1>Entities &amp;amp; Friends</h1>
        <p>double: &amp;amp; hex: &#x27;quoted&#x27; dec: &#169;</p>
        <p>unknown: &fake; bare: AT&T and 1 &lt; 2 &gt; 0</p>
        <p>tag-as-text: &lt;div class="content"&gt;</p>
    </div>
</body>
</html>
"""

HOSTILE_TAGSOUP = """
<html>
<body>
    <DIV CLASS="content" >
        <h1>Tag Soup</h1>
        </div> stray close above? no, that closed the container.
        <p>orphan paragraph</p>
    <div class="content">
        <h2>Second content div</h2>
        <p>unclosed div chain <div><div>deep text
    </div>
</body>
</html>
"""

# round-4 envelope growth (verdict item 8): attribute soup, non-script
# CDATA, deep table nesting, mixed entity/encoding runs

HOSTILE_ATTR_SOUP = """
<html>
<body>
    <div class=content id = main-zone data-x=a&amp;b>
        <h1>Attr Soup</h1>
        <p title='single " quoted'>single-quoted attr</p>
        <p hidden>valueless attr</p>
        <p class="first" class="second">duplicate class: last wins</p>
        <a href=/no-quotes/path.html>unquoted href</a>
        <p TITLE="UPPER attr name" Data-Mixed="case">case folding</p>
        <p data-multi="line one
line two">newline inside attr</p>
    </div>
</body>
</html>
"""

HOSTILE_CDATA_BODY = """
<html>
<body>
    <div class="content">
        <h1>CDATA Outside Script</h1>
        <p>before</p>
        <![CDATA[ raw <div class="content">decoy</div> not markup ]]>
        <p>after</p>
        <![cdata[ lowercase stays a declaration with its prefix ]]>
        <![if !IE]>downlevel-revealed<![endif]>
        <p>end</p>
    </div>
</body>
</html>
"""

HOSTILE_DEEP_TABLES = """
<html>
<body>
    <div class="content">
        <h1>Nested Tables</h1>
        <table>
            <thead><tr><th>h1</th><th>h2</th></tr></thead>
            <tbody>
                <tr><td>outer a</td><td>
                    <table>
                        <tr><td>mid 1</td><td>
                            <table><tr><td>inner x</td><td>inner y</td></tr></table>
                        </td></tr>
                        <tr><td>mid 2</td><td>mid 3</td></tr>
                    </table>
                </td></tr>
                <tr><td>outer b</td><td>plain</td></tr>
            </tbody>
        </table>
        <p>after tables</p>
    </div>
</body>
</html>
"""

HOSTILE_ENTITY_RUNS = """
<html>
<body>
    <div class="content">
        <h1>Entity Runs</h1>
        <p>astral: &#x1F600; supplementary ok</p>
        <p>c1-remap: &#150;dash&#151; euro &#128;</p>
        <p>overflow: &#x110000; and &#99999999; stay literal-safe</p>
        <p>run: &amp;&lt;&gt;&quot;&#39;&nbsp;end</p>
        <p>literal utf8 éü中文 next to &#233;&#252;</p>
        <p>half-entity: &amp something &#x2G bad hex</p>
    </div>
</body>
</html>
"""

# round-4 second wave: pre/code whitespace, quote/definition-list
# structure, foreign content (svg/math/custom elements), and
# PHP/ASP/bogus-markup litter — the four highest-frequency unpinned
# shapes left on real pages.

HOSTILE_PRE_CODE = """
<html>
<body>
    <div class="content">
        <h1>Code</h1>
        <p>inline <code>a *b* _c_</code> and <code>back`tick</code></p>
        <pre>def f(x):
    return x * 2   # trailing spaces follow
</pre>
        <pre><code>&lt;div class="content"&gt;escaped markup&lt;/div&gt;
	tab-indented line</code></pre>
        <pre></pre>
        <p>after empty pre</p>
        <p><kbd>Ctrl</kbd>+<samp>OUT_*raw*</samp></p>
    </div>
</body>
</html>
"""

HOSTILE_QUOTE_DL = """
<html>
<body>
    <div class="content">
        <h1>Quotes</h1>
        <blockquote>
            <p>level one</p>
            <blockquote><p>level two</p></blockquote>
            <ul><li>listed in quote</li><li>second</li></ul>
        </blockquote>
        <blockquote></blockquote>
        <p>between</p>
        <dl>
            <dt>term one</dt>
            <dd>definition one</dd>
            <dt>term two</dt>
            <dd>first definition</dd>
            <dd>second definition</dd>
        </dl>
    </div>
</body>
</html>
"""

HOSTILE_FOREIGN = """
<html>
<body>
    <div class="content">
        <h1>Foreign</h1>
        <p>before svg</p>
        <svg width="100" height="100"><title>chart title</title>
            <text x="0" y="15">svg text node</text>
            <circle cx="50" cy="50" r="40"/>
        </svg>
        <math><mrow><mi>x</mi><mo>=</mo><mn>1</mn></mrow></math>
        <x-widget data-v="1"><p>custom element body</p></x-widget>
        <ns:item>namespaced</ns:item>
        <p>after foreign</p>
    </div>
</body>
</html>
"""

HOSTILE_PI_BOGUS = """
<html>
<body>
    <div class="content">
        <h1>Server Litter</h1>
        <p>a<?php echo "<b>x</b>"; ?>b</p>
        <p><% response.write("asp") %></p>
        <p>1 < 2 and < notatag stay text</p>
        <p><!bogus>after bogus comment</p>
        <p>x<!DOCTYPE html>y doctype in body</p>
        <p>stray close</ div>lost: '&lt;/ div&gt;' closed the container</p>
    </div>
</body>
</html>
"""

# round-4 third wave: interactive-widget litter, inline media/link
# nesting, hard-break/rule runs, and iframe/noscript fallbacks.

HOSTILE_FORMS = """
<html>
<body>
    <div class="content">
        <h1>Forms</h1>
        <p>before form</p>
        <form action="/s" method="post">
            <label for="q">Search label</label>
            <input type="text" id="q" value="typed value">
            <select><option>opt a</option><option selected>opt b</option></select>
            <textarea>area text</textarea>
            <button type="submit">Go button</button>
        </form>
        <p>after form</p>
    </div>
</body>
</html>
"""

HOSTILE_MEDIA_LINKS = """
<html>
<body>
    <div class="content">
        <h1>Media <img src="h.jpg" alt="head img"> Links</h1>
        <p><a href="/x"><img src="i.jpg" alt="linked img"></a></p>
        <p><a href="https://example.com/auto">https://example.com/auto</a></p>
        <p><a href="/t" title="the title">titled link</a></p>
        <p><img src="t.jpg" alt="titled img" title="img title"></p>
        <p><em>em <strong>both</strong></em> <strong><em>swapped</em></strong></p>
        <p><a href="/empty"></a>after empty link</p>
        <p><a>no href text</a></p>
    </div>
</body>
</html>
"""

HOSTILE_BR_HR = """
<html>
<body>
    <div class="content">
        <h1>Breaks<br>inside heading</h1>
        <p>line one<br>line two<br><br>after double break</p>
        <hr>
        <p>between rules</p>
        <hr>
        <hr>
        <p>after adjacent rules</p>
        <ul><li>item<br>continued</li></ul>
    </div>
</body>
</html>
"""

HOSTILE_IFRAME_NOSCRIPT = """
<html>
<body>
    <div class="content">
        <h1>Frames</h1>
        <p>before</p>
        <iframe src="https://embed.test/w"></iframe>
        <noscript><p>noscript fallback text</p></noscript>
        <object data="movie.swf"><p>object fallback</p></object>
        <embed src="plugin.swf">
        <canvas>canvas fallback</canvas>
        <p>after</p>
    </div>
</body>
</html>
"""

# round-4 eighth wave: modern media elements — picture/srcset, video/
# audio with track/source children and fallback text, figure-wrapped
# responsive images.  <source>/<track> are void, carry no text; the
# inner <img> of a <picture> renders; fallback text surfaces.

HOSTILE_MEDIA_ELEMENTS = """
<html>
<body>
    <div class="content">
        <h1>Media Elements</h1>
        <picture>
            <source srcset="big.webp 2x, small.webp 1x" type="image/webp">
            <source srcset="big.jpg" media="(min-width: 800px)">
            <img src="fallback.jpg" alt="responsive pic">
        </picture>
        <p>between</p>
        <video controls poster="poster.jpg">
            <source src="clip.mp4" type="video/mp4">
            <track kind="captions" src="cap.vtt" srclang="en">
            Your browser does not support video.
        </video>
        <audio src="tune.ogg">audio fallback text</audio>
        <figure>
            <picture><img src="fig.png" alt="figured pic"></picture>
            <figcaption>responsive caption</figcaption>
        </figure>
        <p>end</p>
    </div>
</body>
</html>
"""

# round-4 seventh wave: macro composition pages — realistic full-page
# layouts exercising the whole cascade + strip + render path at once
# (every other family is a micro-surface; these pin the interactions).

REALISTIC_BLOG = """
<!DOCTYPE html>
<html lang="en">
<head>
    <meta charset="utf-8">
    <title>Ten Spark Tips — DevBlog</title>
    <meta name="description" content="tips and tricks">
    <script src="/js/analytics.js"></script>
    <style>body { margin: 0 }</style>
</head>
<body>
    <header><nav id="nav"><a href="/">Home</a> <a href="/archive">Archive</a></nav></header>
    <div class="ads"><a href="https://ads.test/click">BUY NOW</a></div>
    <aside class="sidebar">
        <h3>Recent posts</h3>
        <ul><li><a href="/post/9">Older post</a></li></ul>
    </aside>
    <main>
        <article class="post-content content">
            <h1>Ten Spark Tips</h1>
            <p class="byline">By <a href="/authors/sam">Sam Writer</a> on <time datetime="2025-06-01">June 1</time></p>
            <p>Tip one: <strong>push filters down</strong> before anything else.</p>
            <blockquote><p>Measure, don't guess.</p></blockquote>
            <h2>The list</h2>
            <ol>
                <li>Broadcast the small side</li>
                <li>Salt the <em>skewed</em> keys</li>
            </ol>
            <figure><img src="/img/dag.png" alt="the DAG"><figcaption>A happy DAG</figcaption></figure>
            <pre><code>df.groupBy("k").agg(F.sum("v"))</code></pre>
            <p>Comments? <a href="#comments">Jump below</a>.</p>
        </article>
        <section id="comments" class="comments">
            <h2>3 Comments</h2>
            <div class="comment"><p>First!</p></div>
        </section>
    </main>
    <footer><p>&copy; 2025 DevBlog · <a href="/privacy">Privacy</a></p></footer>
</body>
</html>
"""

REALISTIC_DOCS = """
<html>
<head><title>API Reference</title></head>
<body>
    <div id="header"><input type="search" placeholder="Search docs"></div>
    <div class="toc sidebar"><ul><li><a href="#install">Install</a></li><li><a href="#api">API</a></li></ul></div>
    <div id="main-content">
        <h1>API Reference</h1>
        <p>Version <code>2.1</code> — see the <a href="changelog.html">changelog</a>.</p>
        <h2 id="install">Install</h2>
        <pre>pip install example</pre>
        <h2 id="api">API</h2>
        <dl>
            <dt><code>connect(url)</code></dt>
            <dd>Open a connection. Raises <code>TimeoutError</code> after 60s.</dd>
            <dt><code>close()</code></dt>
            <dd>Idempotent.</dd>
        </dl>
        <table>
            <tr><th>Option</th><th>Default</th></tr>
            <tr><td><code>retries</code></td><td>3</td></tr>
            <tr><td><code>timeout</code></td><td>60</td></tr>
        </table>
        <div class="admonition warning"><p><strong>Warning:</strong> not thread-safe.</p></div>
    </div>
    <div class="footer">Generated by docgen</div>
</body>
</html>
"""

# round-4 sixth wave: unicode whitespace, link-scheme edges (incl. the
# root_url rewrite over fragment/scheme/protocol-relative hrefs), and
# heading edges.

HOSTILE_WS_UNICODE = """
<html>
<body>
    <div class="content">
        <h1>Unicode Space</h1>
        <p>nbsp&nbsp;&nbsp;run and ideographic　space</p>
        <p>zero​width‍join and bidi ‪embed‬ marks</p>
        <p>line sep and para sep survive as text</p>
        <p>vtab\x0bhere formfeed\x0chere</p>
        <p>combining é acute and precomposed é</p>
    </div>
</body>
</html>
"""

HOSTILE_LINK_EDGE = """
<html>
<body>
    <div class="content">
        <h1>Link Edges</h1>
        <p><a href="javascript:alert(1)">js scheme</a></p>
        <p><a href="mailto:a@b.test">mail me</a> <a href="tel:+15551234">call</a></p>
        <p><a href="#section-2">fragment only</a></p>
        <p><a href="//cdn.test/lib.js">protocol relative</a></p>
        <p><a href="">empty href</a></p>
        <p><a href="/path with spaces/doc.html">spaced path</a></p>
        <p><a href="data:text/plain;base64,aGk=">data uri</a></p>
        <p><a href="relative/sub.html">relative path</a></p>
    </div>
</body>
</html>
"""

HOSTILE_HEADING_EDGE = """
<html>
<body>
    <div class="content">
        <h1>First H1</h1>
        <h7>not a real heading</h7>
        <h2></h2>
        <h2><img src="only.jpg" alt="only img"></h2>
        <h3>trailing hashes ###</h3>
        <h1>Second H1 later</h1>
        <ul><li><h4>heading in item</h4></li></ul>
        <h2>after list</h2>
    </div>
</body>
</html>
"""

# round-4 fifth wave: table span/structure quirks and list edges —
# the two highest-frequency block shapes left unpinned.

HOSTILE_TABLE_SPAN = """
<html>
<body>
    <div class="content">
        <h1>Spans</h1>
        <table>
            <tr><th colspan="2">wide header</th><th>h3</th></tr>
            <tr><td rowspan="2">tall</td><td>b1</td><td>c1</td></tr>
            <tr><td>b2</td><td></td></tr>
            <tr><td>a3<td>b3<td>c3</tr>
            <tr><td><h2>heading in cell</h2><ul><li>list in cell</li></ul></td>
                <td><p>para one</p><p>para two</p></td><td>plain</td></tr>
        </table>
    </div>
</body>
</html>
"""

HOSTILE_LIST_EDGE = """
<html>
<body>
    <div class="content">
        <h1>List Edges</h1>
        <ol start="5"><li>five</li><li>six</li></ol>
        <ol reversed><li>r1</li><li>r2</li></ol>
        <ul>
            <li><p>loose para one</p><p>loose para two</p></li>
            <li>tight item</li>
        </ul>
        <ul><li>d1<ul><li>d2<ul><li>d3<ul><li>d4</li></ul></li></ul></li></ul></li></ul>
        <li>orphan li outside any list</li>
        <ul><li><blockquote><p>quote in item</p></blockquote></li></ul>
    </div>
</body>
</html>
"""

# round-4 fourth wave: the inline-semantics tail — strikethrough
# family, sub/sup, highlight/insert/underline (pass-through), docs-page
# furniture (details/summary, figure/figcaption), and ruby annotations
# (rt text surfaces inline — the documented markdownify behavior).

HOSTILE_INLINE_TAIL = """
<html>
<body>
    <div class="content">
        <h1>Inline Tail</h1>
        <p><del>deleted</del> and <s>struck</s> and <strike>old strike</strike></p>
        <p>H<sub>2</sub>O and x<sup>2</sup> stay flat</p>
        <p><mark>marked</mark> <ins>inserted</ins> <u>underlined</u> <small>small</small></p>
        <p><abbr title="HyperText">HT</abbr> at <time datetime="2025-06-14">launch day</time></p>
        <details><summary>click me</summary><p>hidden body</p></details>
        <figure><img src="f.jpg" alt="fig img"><figcaption>the caption</figcaption></figure>
        <p><ruby>漢<rt>kan</rt>字<rt>ji</rt></ruby> annotated</p>
        <p><span class="a"><span class="b">nested spans</span></span></p>
    </div>
</body>
</html>
"""

# round-5 ninth wave (verdict-r4 item 4): modern component markup
# (<template>/<slot> — html.parser keeps template content in-tree, so
# it renders like markdownify would), srcdoc iframes (srcdoc is an
# opaque attribute even when it holds raw markup; the iframe's child
# text is the rendered fallback), XHTML/XML-prolog pages with
# misdeclared encodings (the pipeline is str-in — charset declarations
# are inert metadata, the prolog PI is skipped), content illegally
# inside <head> (title still wins; stray head content is outside every
# cascade container), and a programmatic >10k-element stress page
# (wide sections + a 300-deep div spine: parser and renderer must be
# iteration-safe, not recursion-bound).

HOSTILE_TEMPLATE_SLOT = """
<html>
<body>
    <div class="content">
        <h1>Template And Slot</h1>
        <template id="row-tpl"><p>template paragraph <b>bold inside</b></p></template>
        <p>before the card</p>
        <my-card><span slot="title">slotted title</span><slot name="title">fallback title</slot></my-card>
        <template><ul><li>tpl item one</li><li>tpl item two</li></ul></template>
        <p>after templates <a href="/tpl.html">tpl link</a></p>
    </div>
</body>
</html>
"""

# HTML integration points inside foreign content (wave 27): the HTML5
# tree builder re-enters "in body" parsing inside svg <foreignObject> /
# <desc> / <title> and MathML <annotation-xml encoding="text/html"> —
# html.parser (and this engine's DOM) never switch namespace at all, so
# the golden pins that both sides flatten the foreign wrapper and render
# the embedded HTML islands as ordinary flow content.  Camel-case
# foreignObject also exercises tag-name lowercasing on an SVG-only name.
HOSTILE_INTEGRATION_POINTS = """
<html>
<body>
    <div class="content">
        <h1>Integration Points</h1>
        <p>before the chart</p>
        <svg viewBox="0 0 100 100">
            <desc>A <b>described</b> chart</desc>
            <foreignObject x="0" y="0" width="100" height="50">
                <p>island paragraph with <em>emphasis</em> and
                <a href="/island.html">an island link</a></p>
                <ul><li>island item</li></ul>
            </foreignObject>
            <text x="0" y="80">bare svg text</text>
        </svg>
        <math>
            <semantics>
                <mrow><mi>E</mi><mo>=</mo><mi>mc</mi><mn>2</mn></mrow>
                <annotation-xml encoding="text/html">
                    <p>html annotation <code>E = mc^2</code></p>
                </annotation-xml>
                <annotation encoding="application/x-tex">E = mc^2</annotation>
            </semantics>
        </math>
        <p>after the math</p>
    </div>
</body>
</html>
"""

# Legacy remnant tags (wave 27): isindex / nobr / spacer / multicol and
# the <image> alias for <img> — all dropped from modern HTML but alive
# in archived pages.  html.parser treats every one as an unknown
# element (no <image> -> <img> token rewrite: that is a tree-builder
# rule); the golden pins that their text survives as flow content, the
# void-like ones contribute nothing, and <image src> does NOT become a
# Markdown image.
HOSTILE_LEGACY_REMNANTS = """
<html>
<body>
    <div class="content">
        <h1>Legacy Remnants</h1>
        <isindex prompt="Search the archive:">
        <p>words<nobr>glued by nobr</nobr>more words</p>
        <spacer type="horizontal" size="20">
        <multicol cols="2">
            <p>first column paragraph</p>
            <p>second column paragraph</p>
        </multicol>
        <p>an <image src="/old-alias.gif" alt="old image alias"> inline alias</p>
        <blink>do not blink</blink>
        <p>after the remnants</p>
    </div>
</body>
</html>
"""

HOSTILE_SRCDOC_IFRAME = """
<html>
<body>
    <div class="content">
        <h1>Srcdoc Iframes</h1>
        <iframe srcdoc="&lt;p&gt;entity-encoded srcdoc para&lt;/p&gt;">first fallback</iframe>
        <p>between frames</p>
        <iframe src="https://example.test/embed" srcdoc="<em>raw markup in attribute</em>"></iframe>
        <iframe srcdoc='<a href="https://x.test/">srcdoc link</a>'><p>nested fallback para</p></iframe>
        <p>tail after frames</p>
    </div>
</body>
</html>
"""

HOSTILE_XML_PROLOG = """<?xml version="1.0" encoding="ISO-8859-1"?>
<!DOCTYPE html PUBLIC "-//W3C//DTD XHTML 1.0 Strict//EN" "http://www.w3.org/TR/xhtml1/DTD/xhtml1-strict.dtd">
<html xmlns="http://www.w3.org/1999/xhtml" xml:lang="en">
<head>
    <meta http-equiv="Content-Type" content="text/html; charset=shift_jis" />
    <title>Prolog Page</title>
</head>
<body>
    <div class="content">
        <h1>XML Prolog</h1>
        <p>café three&eacute; ways &#233; — literal, named, numeric</p>
        <p>self-closed<br />break and rule<hr /></p>
        <p><a href="/x.html" title="xhtml attr">xhtml link</a></p>
    </div>
</body>
</html>
"""

HOSTILE_HEAD_CONTENT = """
<html>
<head>
    <title>Head Recovery</title>
    <p>stray paragraph illegally inside head</p>
    <meta name="desc" content="meta stays metadata">
    <h2>stray heading in head</h2>
    <style>p { color: red }</style>
</head>
<body>
    <div class="content">
        <h1>Body Proper</h1>
        <p>real body text with <a href="/b.html">a body link</a></p>
    </div>
</body>
</html>
"""


def _stress_10k_html() -> str:
    """Deterministic >10k-element page: 600 wide sections (headings,
    links, images, lists — every variant knob has work to do) plus a
    300-deep nested-div spine.  Pure construction, no randomness: the
    golden bytes are stable across regenerations."""
    parts = ['<html><head><title>Stress Page</title></head><body>',
             '<div class="ads">STRESS SPONSOR</div>',
             '<nav id="nav"><a href="/home">Home</a></nav>',
             '<div class="content"><h1>Stress</h1>']
    for s in range(600):
        parts.append(
            f'<h2>Section {s}</h2>'
            f'<p>para {s} with <a href="/docs/{s}.html">link {s}</a>'
            f' and <b>bold {s}</b></p>'
            f'<ul><li>item {s}a</li><li>item {s}b</li></ul>'
            f'<p><img src="/img/{s}.png" alt="alt {s}"></p>')
    parts.append('<h3>Deep Spine</h3>')
    parts.append('<div>' * 300 + '<p>deep core</p>' + '</div>' * 300)
    parts.append('<p>after the spine</p></div></body></html>')
    return "".join(parts)


STRESS_10K = _stress_10k_html()

# round-5 twenty-ninth wave: the nesting-depth envelope.  The DOM
# parser walks an explicit stack (htmlcore/dom.py) so parse depth is
# unbounded, but the renderer recurses — fine to ~800 levels under
# CPython's default 1000-frame limit, beyond which the per-row error
# contract (G6) must catch the RecursionError and emit a status=error
# row, never a task failure.  stress-deep-750 pins the deep-but-
# renderable side byte-exactly; stress-deep-overflow (3000 levels,
# past any plausible limit) pins the graceful-degradation bytes (the
# error sentinel) for every option variant.  Real Common-Crawl pages
# do reach pathological depth (auto-generated markup, unclosed-tag
# repair cascades), and a recursion crash inside an Arrow batch would
# kill the whole task — this wave is the regression fence for that
# seam (probed live: depths 100-800 render, 2000+ degrade to error).


def _deep_spine_html(depth: int) -> str:
    """Deterministic depth-``depth`` nested-div page with variant
    hooks (link, image, excludable ads div) above and below the
    spine."""
    return (
        '<html><head><title>Deep Spine</title></head><body>'
        '<div class="ads">DEEP SPONSOR</div>'
        f'<div class="content"><h1>Depth {depth}</h1>'
        '<p>before the spine with <a href="/deep/pre.html">a pre link</a>'
        ' and <img src="/img/pre.png" alt="pre alt"></p>'
        + '<div>' * depth
        + '<p>the bottom of the well</p>'
        + '</div>' * depth
        + '<h2>After</h2><p>after the spine</p></div></body></html>')


STRESS_DEEP_750 = _deep_spine_html(750)
STRESS_DEEP_OVERFLOW = _deep_spine_html(3000)

# round-5 tenth wave: the legacy/obsolete tail and table sectioning.
# <xmp> is NOT rawtext under html.parser (only script/style are), so
# markup inside it renders — the bs4-model behavior this engine pins;
# li under <dir>/<menu> hits the documented orphan-li dash quirk (no
# ul/ol ancestor); table sections render in DOCUMENT order (a tfoot
# declared first surfaces first) with the header delimiter under the
# th row; <base href> is inert (markdownify has no base support) so
# relative hrefs stay verbatim; kbd/samp code-wrap while tt stays
# plain (exactly markdownify's convert map); q adds no quote marks.

HOSTILE_LEGACY_TAIL = """
<html>
<body>
    <div class="content">
        <h1>Legacy Tail</h1>
        <center>centered text</center>
        <font color="red" size="3">font text</font>
        <p><tt>teletype</tt> and <big>big text</big> and <acronym title="As Soon As">ASAP</acronym></p>
        <marquee>scrolling text</marquee>
        <blink>blinking</blink>
        <dir><li>dir item</li></dir>
        <menu><li>menu item</li></menu>
        <xmp>raw <b>xmp bold renders</b> here</xmp>
        <p>after legacy <a href="/legacy.html">legacy link</a></p>
    </div>
</body>
</html>
"""

HOSTILE_TABLE_SECTIONS = """
<html>
<body>
    <div class="content">
        <h1>Table Sections</h1>
        <table>
            <caption>the caption</caption>
            <colgroup><col span="2" style="background:red"><col></colgroup>
            <tfoot><tr><td>foot a</td><td>foot b</td></tr></tfoot>
            <thead><tr><th scope="col">Head A</th><th>Head B</th></tr></thead>
            <tbody><tr><td>body a</td><td>body b</td></tr></tbody>
        </table>
        <p>after table</p>
    </div>
</body>
</html>
"""

HOSTILE_INLINE_ODDITIES = """
<html>
<head><base href="https://based.test/sub/"><title>Odd Page</title></head>
<body>
    <div class="content">
        <h1>Inline Oddities</h1>
        <p><q>outer <q>inner</q> quote</q></p>
        <p><bdo dir="rtl">reversed run</bdo> and <bdi>isolate</bdi></p>
        <p>super<wbr>cali<wbr>fragilistic</p>
        <p><data value="42">the answer</data> <kbd>Ctrl</kbd>+<kbd>C</kbd> <samp>sample out</samp> <var>x</var></p>
        <p><output>7</output> <progress value="0.3">30%</progress> <meter value="0.6">60%</meter></p>
        <dialog open><p>dialog body</p></dialog>
        <datalist id="dl"><option value="a">opt text</option></datalist>
        <p><a href="rel.html">base-relative link</a></p>
    </div>
</body>
</html>
"""

# round-5 eleventh wave: attribute-edge parsing (duplicate attributes
# keep the LAST value — the bs4/html.parser-builder default; unquoted
# and valueless attributes; newlines inside quoted values flowing
# verbatim into the markdown link; numeric character references
# resolved inside attribute values) and raw control characters in text
# (NUL/BEL/backspace pass through as data exactly as html.parser
# forwards them — a real-crawl page can carry any byte).

HOSTILE_ATTR_EDGE = """
<html>
<body>
    <div class="content">
        <h1>Attr Edge</h1>
        <p><a href="/first.html" href="/second.html">dup href keeps last</a></p>
        <p><img src="/a.png" alt="one" alt="two"></p>
        <p><a href=/unquoted/path.html>unquoted value</a></p>
        <p><input disabled data-empty class="x">valueless attrs inert</p>
        <p><a href="/a&#47;b.html" title="ref &amp; title">entity in attr</a></p>
        <p><a href="/line
break.html" title="multi
line">newline in attr</a></p>
    </div>
</body>
</html>
"""

HOSTILE_CTRL_CHARS = (
    "\n<html>\n<body>\n    <div class=\"content\">\n"
    "        <h1>Ctrl\x07Chars</h1>\n"
    "        <p>null\x00byte bell\x07 backspace\x08 survive as data</p>\n"
    "        <p>escape\x1b[31m ansi stays literal</p>\n"
    "        <p><a href=\"/x.html\">del\x7fchar in link text</a></p>\n"
    "    </div>\n</body>\n</html>\n")

# round-5 twelfth wave: parser-recovery shapes around tables and form
# widgets.  Stray text directly inside <table>/<tr> stays IN PLACE (no
# browser-style foster parenting — html.parser keeps it, so the bs4
# model renders it where it sits); a headerless table gets
# markdownify's padded empty header row; unclosed <option> chains nest
# (no implied closes per the DOM contract) and surface as concatenated
# text; nested forms both render.

HOSTILE_TABLE_RECOVERY = """
<html>
<body>
    <div class="content">
        <h1>Table Recovery</h1>
        <table>stray text directly in table
            <tr>row-level text<td>cell a</td>more row text<td>cell b</td></tr>
            <li>list item inside table</li>
            <tr><td><table><tr><td>inner</td></tr>text in inner table</table></td></tr>
        </table>
        <p>after the table</p>
    </div>
</body>
</html>
"""

HOSTILE_SELECT_FORM = """
<html>
<body>
    <div class="content">
        <h1>Select And Form</h1>
        <select><option>one<option>two</option><optgroup label="g"><option>three</optgroup></select>
        <form action="/outer"><p>outer form body</p>
            <form action="/inner"><p>nested form body</p></form>
        </form>
        <fieldset><legend>the legend</legend><p>fieldset body</p></fieldset>
        <p>end <a href="/f.html">form link</a></p>
    </div>
</body>
</html>
"""

# round-5 thirteenth wave: markdown-metacharacter collisions and text
# shaping.  Source text that LOOKS like markdown (leading '#', '>',
# '-', '1.', fenced backticks, '[x](y)' link syntax, '|' pipes) must
# pass through with only '*' and '_' escaped — the markdownify
# contract escapes nothing else, so a rendered page can contain lines
# a later markdown parser would re-interpret; the byte contract pins
# that rather than papering over it.  Table cells carrying pipes,
# backticks and block children pin the cell-flattening seams, and the
# bidi/shaping page pins invisible code points (RLM, ZWJ, soft
# hyphen), <bdo>/<bdi> transparency, <wbr> dropping, and unbroken
# kilobyte-scale tokens flowing through the wrap-free renderer.

HOSTILE_MD_METACHARS = """
<html>
<body>
    <div class="content">
        <h1>MD Metachars</h1>
        <p># not a heading</p>
        <p>> not a quote</p>
        <p>- not a bullet</p>
        <p>1. not an ordered item</p>
        <p>```not a fence```</p>
        <p>[not](a-link.html) and ![not](an-image.png)</p>
        <p>pipes | in | plain text</p>
        <p>lit*eral aster*isks and snake_case_name</p>
        <p>+ plus bullet and ~~tilde run~~</p>
        <p>backslash\\mid\\path stays</p>
        <p><code>#code > is | not *escaped*_ever</code></p>
    </div>
</body>
</html>
"""

HOSTILE_TABLE_PIPES = """
<html>
<body>
    <div class="content">
        <h1>Table Pipes</h1>
        <table>
            <tr><th>col|a</th><th>col`b`</th></tr>
            <tr><td>1 | 2</td><td>tick `x`</td></tr>
            <tr><td>line<br>break cell</td><td><p>para</p><p>cell</p></td></tr>
            <tr><td>*star* _under_</td><td><ul><li>li one</li><li>li two</li></ul></td></tr>
        </table>
        <p>after pipes table</p>
    </div>
</body>
</html>
"""

HOSTILE_BIDI_SHAPING = (
    "\n<html>\n<body>\n    <div class=\"content\">\n"
    "        <h1>Bidi Shaping</h1>\n"
    "        <p>שלום and مرحبا mixed with latin</p>\n"
    "        <p><bdo dir=\"rtl\">forced rtl run</bdo> then "
    "<bdi>isolated‏ run</bdi></p>\n"
    "        <p>soft­hyphen zero‍width​joiners stay</p>\n"
    "        <p>long<wbr>word<wbr>break opportunities vanish</p>\n"
    "        <p>" + "x" * 1200 + "</p>\n"
    "        <p><a href=\"/q?a=1&amp;b=2#frag\">" + "verylongtoken" * 40
    + "</a></p>\n"
    "    </div>\n</body>\n</html>\n")

# round-5 fourteenth wave: case folding, raw-text element seams, and
# document-structure recovery.  html.parser lowercases tag AND
# attribute names (so <DIV CLASS="content"> must hit the content
# cascade), but attribute VALUES keep their case; script/style are the
# only CDATA elements html.parser knows — the first literal </script>
# terminates the element even inside a JS string (the classic
# "</scr"+"ipt>" page loses its tail), while <textarea>/<title> get NO
# RCDATA treatment, so markup inside them parses as real elements (a
# documented html.parser-vs-browser divergence the byte contract
# pins).  Legacy doctypes, meta-refresh litter, a second <body>, and
# stray </html> followed by trailing content exercise structural
# recovery: html.parser emits them all as ordinary tags/data and the
# pipeline must keep flowing.

HOSTILE_CASE_TAGS = """
<HTML>
<BODY>
    <DIV CLASS="content">
        <H1>Case Tags</H1>
        <P>upper tags lower fine</P>
        <p><A HREF="/Upper/Path.html" TITLE="Keep Value Case">mixed link</A></p>
        <p><IMG SRC="/CasePic.PNG" ALT="Case Alt"></p>
        <P><STRONG>bold</STRONG> and <Em>italic</Em> survive</P>
        <UL><LI>item one<LI>item two</UL>
    </DIV>
</BODY>
</HTML>
"""

HOSTILE_RAWTEXT_MARKUP = """
<html>
<body>
    <div class="content">
        <h1>Rawtext Markup</h1>
        <p>before script</p>
        <script>var s = "</script> leaked tail after early close</p>
        <p>style selectors opaque:</p>
        <style>p > a { color: red; } /* <b>not bold</b> */</style>
        <textarea>plain area <b>parsed bold</b> inside</textarea>
        <p>title in body: <title>not <em>rcdata</em> here</title> done</p>
        <p>after rawtext</p>
    </div>
</body>
</html>
"""

HOSTILE_DOCTYPE_META = """
<!DOCTYPE HTML PUBLIC "-//W3C//DTD HTML 4.01 Transitional//EN"
  "http://www.w3.org/TR/html4/loose.dtd">
<html>
<head>
    <meta http-equiv="refresh" content="5; url=/redirect.html">
    <meta charset="iso-8859-1">
    <link rel="preload" href="/font.woff2" as="font">
</head>
<body>
    <div class="content">
        <h1>Doctype Meta</h1>
        <p>first body content</p>
    </div>
</body>
<body>
    <p>second body treated as plain element</p>
</body>
</html>
</html>
<p>content after the close persists</p>
"""

# round-5 fifteenth wave: legacy page *architectures* a crawl still
# surfaces.  Frameset pages (no <body>; frame fallback lives in
# <noframes>, whose children html.parser parses as ordinary markup),
# IE conditional comments (real comments — skipped whole, including
# the markup inside), downlevel-REVEALED conditionals (<![if !IE]> is
# a bogus declaration html.parser drops while the INNER markup stays
# live), a leading BOM (U+FEFF arrives as text data before <html> and
# must not derail container detection), and <plaintext>/<listing>
# (html.parser gives them NO raw-text treatment: content keeps
# parsing as markup — pinned divergence from browsers).

HOSTILE_FRAMESET = """
<html>
<head><title>Frameset Page</title></head>
<frameset cols="20%,80%">
    <frame src="/nav.html">
    <frame src="/main.html">
    <noframes>
        <body>
            <div class="content">
                <h1>No Frames</h1>
                <p>fallback body for frameless crawlers</p>
                <p><a href="/main.html">main content link</a></p>
            </div>
        </body>
    </noframes>
</frameset>
</html>
"""

HOSTILE_COND_COMMENTS = """
<html>
<body>
    <div class="content">
        <h1>Cond Comments</h1>
        <p>before conditionals</p>
        <!--[if IE 6]><p>ie6 only markup vanishes</p><![endif]-->
        <!--[if lt IE 9]>
        <script src="/html5shiv.js"></script>
        <![endif]-->
        <![if !IE]><p>downlevel-revealed stays live</p><![endif]>
        <p>after conditionals</p>
    </div>
</body>
</html>
"""

HOSTILE_BOM_PLAINTEXT = (
    "﻿<html>\n<body>\n    <div class=\"content\">\n"
    "        <h1>Bom Plaintext</h1>\n"
    "        <p>bom swallowed upstream of the container</p>\n"
    "        <listing>listing <b>parses</b> as markup</listing>\n"
    "        <plaintext>plaintext keeps <i>parsing</i> too"
    " <a href=\"/x.html\">live link</a>\n"
    "    </div>\n</body>\n</html>\n")

# round-5 sixteenth wave: block-context composition and cascade
# ambiguity.  Deep nesting of BLOCK semantics (pre inside li,
# blockquote 3 levels deep, a list inside a table cell inside a list,
# hr inside blockquote) pins the indentation/prefix seams where the
# renderer's per-context rules interact; the ambiguity page pins the
# cascade's winner when several candidates qualify at once (two
# sibling content-class divs, a content div nested INSIDE another,
# and an id="content" decoy beside them — one deterministic winner,
# byte-stable under any partitioning).

HOSTILE_BLOCK_COMPOSE = """
<html>
<body>
    <div class="content">
        <h1>Block Compose</h1>
        <ul>
            <li>item with pre:<pre>code line one
  indented two</pre>tail text</li>
            <li><blockquote>quoted in item<blockquote>deeper<blockquote>deepest</blockquote></blockquote></blockquote></li>
        </ul>
        <blockquote><p>para</p><hr><p>after rule</p></blockquote>
        <table><tr><td>cell list:<ol><li>first<ul><li>nested bullet</li></ul></li><li>second</li></ol></td></tr></table>
        <p>after compose</p>
    </div>
</body>
</html>
"""

HOSTILE_CASCADE_AMBIGUITY = """
<html>
<body>
    <div class="content"><p>class candidate earlier in document order</p></div>
    <div class="content"><p>second class candidate with much much longer body text</p></div>
    <div id="content"><h1>Id Wins</h1><p>the id stage runs before the class stage even this late in the page</p></div>
</body>
</html>
"""

HOSTILE_CASCADE_SIBLINGS = """
<html>
<body>
    <div class="content"><h1>First Sibling</h1><p>document-order winner</p></div>
    <div class="content"><p>longer second sibling never considered despite all this extra body text</p></div>
    <div class="wrapper">
        <div class="content">
            <p>outer nested candidate</p>
            <div class="content"><p>inner nested candidate rides along inside the winner's subtree only if the outer loses</p></div>
        </div>
    </div>
</body>
</html>
"""

# round-5 seventeenth wave: URL soup, image-attribute edges, and
# title-selection edges.  Hrefs carry IDN hosts, percent-encodings,
# raw unicode paths, embedded whitespace and a nested <a> (the inner
# anchor nests per the no-implied-close DOM contract); images miss
# src or alt (markdownify renders empty strings for both), carry
# lazy-loading data-src (ignored — not src), or sit inside links
# inside figures; the title page pins h1 selection when several
# compete and when the first h1 lives inside an excluded/stripped
# node (the exclude variant changes the surviving heading set).

HOSTILE_URL_SOUP = """
<html>
<body>
    <div class="content">
        <h1>Url Soup</h1>
        <p><a href="https://bücher.example/straße.html">idn host raw unicode path</a></p>
        <p><a href="/p%20q/r%2Fs.html?x=1&amp;y=%26#frag%20end">percent soup</a></p>
        <p><a href="/has space/in path.html">literal spaces kept</a></p>
        <p><a href="/outer.html">outer <a href="/inner.html">nested anchor</a> tail</a></p>
        <p><a href="//host.example/proto-relative?q=a+b">plus query</a></p>
        <p><a href="?only=query">query-only href</a> and <a href="#only-frag">frag-only</a></p>
    </div>
</body>
</html>
"""

HOSTILE_IMG_EDGE = """
<html>
<body>
    <div class="content">
        <h1>Img Edge</h1>
        <p><img alt="no src at all"></p>
        <p><img src="/bare.png"></p>
        <p><img src="/empty-alt.png" alt=""></p>
        <p><img src="/titled.png" alt="has title" title="tooltip text"></p>
        <p><img data-src="/lazy.png" alt="lazy loader"></p>
        <figure><a href="/full.html"><img src="/thumb.png" alt="linked thumb"></a></figure>
        <p><img src="/multi.png" alt="multi
line alt"></p>
    </div>
</body>
</html>
"""

HOSTILE_TITLE_EDGE = """
<html>
<head><title>Head Title Decoy</title></head>
<body>
    <div class="content">
        <div id="nav"><h1>Excluded First H1</h1></div>
        <h1>Second H1 Wins When Nav Stripped</h1>
        <p>body text</p>
        <h1>Third H1 Ignored</h1>
    </div>
</body>
</html>
"""

# round-5 eighteenth wave: comment-termination edges and the
# empty-inline chomp seams.  html.parser's comment scanner (probed
# directly against the stdlib, this golden pins the same bytes our
# DOM produces on top of it): `<!-->` / `<!--->` are NOT empty
# comments — each opens a comment that runs to the NEXT `-->` in the
# stream (here: the one `<!--->` itself completes), swallowing
# intervening markup including `</p>` closers; comments cannot nest
# (the first `-->` wins, a stray inner `<!--` is comment content);
# `--` inside a comment is fine; and an UNCLOSED trailing comment is
# flushed as literal DATA at close() — its text (including the
# `<!--`) SURVIVES into the markdown rather than vanishing.  The
# inline page pins markdownify's chomp algebra: whitespace-only
# strong/em render as bare whitespace (no `**` litter), edge
# whitespace migrates OUTSIDE the markers, empty inline wrappers
# vanish, and backticks inside code spans pass through verbatim
# (single-backtick wrap regardless — the pinned markdownify
# behavior).

HOSTILE_COMMENT_EDGE = """
<html>
<body>
    <div class="content">
        <h1>Comment Edge</h1>
        <p>bogus open swallows to next close <!--> gone</p>
        <p>reopened by <!---> this tail survives</p>
        <p>first close wins <!-- outer <!-- inner --> tail text</p>
        <p>comment with dashes <!-- a -- b --> after</p>
        <p>before the unclosed comment</p>
        <!-- this trailing comment never closes; html.parser flushes it
        <p>as literal data at close(), so this text SURVIVES</p>
    </div>
</body>
</html>
"""

HOSTILE_INLINE_EMPTY = """
<html>
<body>
    <div class="content">
        <h1>Inline Empty</h1>
        <p>a<strong> </strong>b keeps the gap</p>
        <p>c<em></em>d collapses clean</p>
        <p><strong>  padded  </strong>edge space migrates out</p>
        <p><a href="/x.html">  link pad  </a>stays linked</p>
        <p>code with <code>back`tick</code> inside</p>
        <p>empty <code></code> code and blank <code>   </code> code</p>
        <p><em><strong>nested empty</strong></em> then <em><strong></strong></em>done</p>
    </div>
</body>
</html>
"""

# round-5 nineteenth wave: the embedded-object fallback tail — the
# plugin/replaced elements a crawl of older pages still carries.
# <object>/<applet> fallback content and <param> (void-ish, no text)
# render like any other transparent container; <embed> is void;
# <map>/<area> image maps keep the map's text children while the void
# <area> contributes nothing; <canvas> renders its fallback; <meter>/
# <progress>/<output> surface their text values inline; <keygen> (an
# obsolete void tag html.parser treats as an ordinary unknown
# element) must not derail its paragraph.

HOSTILE_OBJECT_FALLBACK = """
<html>
<body>
    <div class="content">
        <h1>Object Fallback</h1>
        <object data="/movie.swf" type="application/x-shockwave-flash">
            <param name="quality" value="high">
            <p>flash fallback paragraph with <a href="/plain.html">plain link</a></p>
        </object>
        <applet code="Old.class" width="100"><p>applet fallback text</p></applet>
        <p>embed is void: <embed src="/thing.svg" type="image/svg+xml"> after embed</p>
        <p><img src="/map.png" alt="mapped" usemap="#m"></p>
        <map name="m">
            <area shape="rect" coords="0,0,10,10" href="/zone1.html" alt="zone one">
            map body text
        </map>
        <canvas width="300" height="150"><p>canvas fallback content</p></canvas>
        <p>disk <meter value="0.7">70%</meter> full, job <progress value="3" max="10">30%</progress> done, sum <output>42</output></p>
        <p>before keygen <keygen name="key"> after keygen</p>
    </div>
</body>
</html>
"""

# round-5 twentieth wave: modern semantic-layout pages.  The cascade
# (reference parity) inspects only div id/class, <article>, then
# largest-div — so a page whose content lives in <main>/<section> with
# NO qualifying div or article falls through to stage 6: the largest
# DIV wins even when it is a thin wrapper around the semantic tree
# (or, with no div at all, extraction reports its no-container error
# status — pinned by the divless variant).  hgroup/address/search and
# a sticky <dialog open> render transparently wherever they sit.

HOSTILE_SEMANTIC_PAGE = """
<html>
<body>
    <div class="page-shell">
        <nav><a href="/home.html">home nav link</a></nav>
        <main>
            <hgroup><h1>Semantic Page</h1><p>subtitle line</p></hgroup>
            <section><h2>Section One</h2><p>main semantic body text, the bulk of the page lives here</p></section>
            <aside><p>aside pull quote</p></aside>
            <search><p>search form placeholder</p></search>
        </main>
        <dialog open><p>sticky dialog content</p></dialog>
        <footer><address>1 Example Way<br>Sampletown</address></footer>
    </div>
</body>
</html>
"""

HOSTILE_SEMANTIC_DIVLESS = """
<html>
<body>
    <main>
        <h1>Divless Semantic</h1>
        <section><p>no div anywhere on this page and no article either</p></section>
    </main>
</body>
</html>
"""

# round-5 twenty-first wave: the error-path statuses as byte goldens.
# A found container whose render collapses to nothing (only script/
# style/comments inside) pins the render_empty status sentinel in
# EVERY variant; the degenerate documents (empty string, whitespace-
# only, comment-only, bare doctype) pin no_content — per-row error
# isolation is the north rule's 10^12-document requirement, and these
# freeze its exact surface (status strings included) rather than just
# asserting "doesn't crash".

HOSTILE_RENDER_EMPTY = """
<html>
<body>
    <div class="content">
        <script>var invisible = true;</script>
        <style>.content { color: red; }</style>
        <!-- only non-rendering nodes in the container -->
    </div>
    <div class="decoy"><p>text outside the detected container</p></div>
</body>
</html>
"""

DEGENERATE_EMPTY = ""
DEGENERATE_WHITESPACE = "   \n\t  \n"
DEGENERATE_COMMENT_ONLY = "<!-- a comment and nothing else -->"
DEGENERATE_DOCTYPE_ONLY = "<!DOCTYPE html>\n"

# round-5 twenty-second wave: phrasing/annotation surfaces no earlier
# family touches.  ruby/rt/rp annotation trees (rt/rp render inline —
# pinning whether furigana leaks into the text), image maps (<area> is
# a VOID link-bearing element: no_links and relative-URL rewrite must
# treat it consistently with <a>), <base href> (parsed but — reference
# parity — NOT consulted by the rewrite, which keys on the page URL;
# the golden pins that non-behavior so a future "fix" is a deliberate
# byte-contract change), custom/namespaced elements (hyphenated tags,
# svg:rect-style prefixes, unknown tags mid-paragraph render
# transparently), newline-convention soup (CR / CRLF normalize to LF
# and newline runs collapse to ONE intra-paragraph newline, while
# FF / VT / NEL / U+2028 / U+2029 are NOT in the ASCII collapse class
# and pass through as literal text bytes), and the inline semantic set
# (q/abbr/dfn/time/data/var/samp/kbd/sub/sup) whose tags strip to
# their text without inserting breaks.

HOSTILE_RUBY_ANNO = """
<html>
<body>
    <div class="content">
        <h1>Ruby <ruby>注<rt>ちゅう</rt></ruby> Annotations</h1>
        <p>Plain <ruby>漢字<rp>(</rp><rt>かんじ</rt><rp>)</rp></ruby> in a sentence.</p>
        <p><a href="/kanji.html"><ruby>東京<rt>とうきょう</rt></ruby></a> as link text.</p>
        <p>Nested base: <ruby><ruby>字<rt>じ</rt></ruby>引<rt>びき</rt></ruby> end.</p>
        <p>Bare rt outside ruby: <rt>orphan reading</rt> tail.</p>
    </div>
</body>
</html>
"""

HOSTILE_MAP_AREA = """
<html>
<body>
    <div class="content">
        <h1>Image Map</h1>
        <img src="chart.png" alt="clickable chart" usemap="#regions">
        <map name="regions">
            <area shape="rect" coords="0,0,50,50" href="north.html" alt="north region">
            <area shape="circle" coords="75,75,20" href="/abs/south.html" alt="south region">
            <area shape="default" alt="no href area">
        </map>
        <p>after the map</p>
    </div>
</body>
</html>
"""

HOSTILE_BASE_HREF = """
<html>
<head>
    <title>Base Href</title>
    <base href="https://cdn.example.org/assets/" target="_blank">
    <base href="https://second-base.example/ignored/">
</head>
<body>
    <div class="content">
        <h1>Base Interaction</h1>
        <p><a href="rel/page.html">document-relative link</a></p>
        <p><a href="/root/page.html">root-relative link</a></p>
        <p><img src="pic.png" alt="relative image"></p>
        <p><a href="https://absolute.example/x.html">absolute link</a></p>
    </div>
</body>
</html>
"""

HOSTILE_CUSTOM_ELEMENTS = """
<html>
<body>
    <div class="content">
        <h1>Custom Elements</h1>
        <my-card><p>paragraph inside an autonomous custom element</p></my-card>
        <p>inline <my-badge>badge text</my-badge> continues.</p>
        <svg:rect width="5"><p>prefixed-tag interior</p></svg:rect>
        <unknowntag>unknown block-ish tag text</unknowntag>
        <p>word<wbr>break<wbr>opportunities stay glued.</p>
        <is-void-looking />after a self-closed unknown tag.
    </div>
</body>
</html>
"""

HOSTILE_NEWLINE_SOUP = (
    "<html>\r\n<body>\r<div class=\"content\">\r\n"
    "<h1>Newline\rSoup</h1>\r\n"
    "<p>carriage\rreturn only</p>\r"
    "<p>form\x0cfeed and vertical\x0btab inside</p>\n"
    "<p>NEL\x85separated and LS separated and PS separated</p>\r\n"
    "<p>mixed\r\n\rrun\n\r\ntail</p>\r\n"
    "</div>\r\n</body>\r\n</html>\r\n"
)

HOSTILE_INLINE_SEMANTICS = """
<html>
<body>
    <div class="content">
        <h1>Inline Semantics</h1>
        <p>She said <q>nested <q>inner quote</q> outer</q> plainly.</p>
        <p><abbr title="HyperText Markup Language">HTML</abbr> and <dfn id="d">definition term</dfn>.</p>
        <p>Meeting at <time datetime="2026-08-19T10:00">ten</time>, build <data value="42">forty-two</data>.</p>
        <p>Use <var>x</var> with <samp>out.log</samp> via <kbd>Ctrl+C</kbd>.</p>
        <p>H<sub>2</sub>O and E=mc<sup>2</sup> mid-word.</p>
        <p><bdi>user123</bdi> scored <bdo dir="rtl">reversed run</bdo> points.</p>
    </div>
</body>
</html>
"""

# round-5 twenty-fourth wave: the modern ANNOTATION layer — markup a
# 2020s crawl carries on almost every commercial page but that renders
# to nothing (or must NOT render to nothing) in a text pipeline.
# hostile-annotation-layer pins: JSON-LD <script type="application/
# ld+json"> blocks strip with every other script (their text must
# never leak into the Markdown); schema.org microdata attributes
# (itemscope/itemtype/itemprop) and ARIA attributes (role,
# aria-hidden, aria-label, tabindex) are attribute-level noise the
# reference never consults — an aria-hidden="true" subtree therefore
# STILL RENDERS (reference parity: bs4/markdownify see only tags, so a
# "fix" that hides it would be a byte-contract change); lazy-load
# images (src="" + data-src, loading="lazy", or data-src with no src
# at all) render with whatever `src` holds — ![alt]() for the
# srcless forms, pinning that data-src is NOT consulted.
# hostile-invisible-chars pins the zero-width/formatting tail: soft
# hyphen, ZWSP/ZWNJ/ZWJ, word joiner, ZWNBSP mid-text, non-breaking
# hyphen, and a combining accent — none are ASCII/Unicode whitespace,
# so clean_text's collapse must pass every one through byte-intact.
# realistic-consent-overlay is the macro case: a cookie-consent
# dialog, skeleton-loader placeholders, and toast/ARIA-live regions
# wrap a real article in div.content — content-class detection must
# outrank the (textually fatter) overlay soup, so NONE of the consent/
# toast/paywall chrome reaches the Markdown; the goldens pin that the
# output is the article alone, identical across default and exclude
# (the .ads block sits outside the detected container, so the
# selector pass has nothing left to prune).

HOSTILE_ANNOTATION_LAYER = """
<html>
<head>
    <title>Annotation Layer</title>
    <meta property="og:title" content="OG title must not render">
    <meta name="twitter:card" content="summary">
    <link rel="preload" href="/fonts/a.woff2" as="font">
    <script type="application/ld+json">
    {"@context": "https://schema.org", "@type": "Article",
     "headline": "JSON-LD headline must never leak",
     "author": {"@type": "Person", "name": "Leaky McLeakface"}}
    </script>
</head>
<body>
    <div class="content" itemscope itemtype="https://schema.org/Article">
        <h1 itemprop="headline">Annotated Article</h1>
        <script type="application/ld+json">{"@type": "BreadcrumbList", "name": "body json-ld also strips"}</script>
        <p itemprop="articleBody">Microdata attributes are invisible; this <span itemprop="about" itemscope itemtype="https://schema.org/Thing"><span itemprop="name">annotated span</span></span> reads as plain text.</p>
        <p role="note" aria-label="label text never renders" tabindex="0">A note with <a href="/ref.html" role="doc-noteref" aria-describedby="fn1">an annotated link</a> inside.</p>
        <div aria-hidden="true"><p>aria-hidden text still renders: the reference never consults ARIA.</p></div>
        <p>Lazy images: <img src="" data-src="/img/lazy1.jpg" alt="empty src" loading="lazy"> and <img data-src="/img/lazy2.jpg" alt="srcless"> and an eager <img src="/img/eager.jpg" alt="eager" loading="lazy">.</p>
        <p hidden>the hidden attribute is also unconsulted and renders.</p>
    </div>
</body>
</html>
"""

HOSTILE_INVISIBLE_CHARS = """
<html>
<body>
    <div class="content">
        <h1>Invisible Characters</h1>
        <p>soft&shy;hyphen&shy;ated word survives with U+00AD intact.</p>
        <p>zero&#8203;width&#8203;space and zero&zwnj;width&zwnj;non&zwnj;joiner and a zw&zwj;j ligature hint.</p>
        <p>word&#8288;joiner glues, ZWNBSP&#65279;mid-text passes, non&#8209;breaking hyphen stays.</p>
        <p>combining: cafe&#769; versus caf&eacute; — NFC is NOT applied.</p>
        <p>&#8203;&shy;&#8288;</p>
    </div>
</body>
</html>
"""

REALISTIC_CONSENT_OVERLAY = """
<html>
<head><title>Overlaid Article — ExampleApp</title></head>
<body>
    <div id="app-shell">
        <div class="cookie-consent" role="dialog" aria-modal="true">
            <h2>We value your privacy</h2>
            <p>We and our 847 partners store cookies on your device.</p>
            <button>Accept all</button> <button>Reject all</button>
            <div class="ads"><p>consent-wall sponsor message</p></div>
        </div>
        <div class="skeleton-loader" aria-hidden="true">
            <div class="skeleton-line"></div>
            <div class="skeleton-line"></div>
        </div>
        <div class="content">
            <h1>The Actual Article</h1>
            <p class="dek">Everything around this block is app chrome.</p>
            <p>Body paragraph one: the cascade must land here, not on the consent dialog or the toast rail, because content-class detection outranks size.</p>
            <h2>Details</h2>
            <p>Body paragraph two with a <a href="/more.html">relative link</a> and an <img src="/img/fig.png" alt="figure"> inline.</p>
        </div>
        <div class="toast-region" role="status" aria-live="polite"><p>Saved to reading list</p></div>
        <div class="paywall-meter"><p>2 free articles left this month</p></div>
    </div>
</body>
</html>
"""

# round-5 twenty-sixth wave: the forum-thread macro page — the last
# major page architecture a web crawl hits that no existing macro
# covers: REPEATED post structure (header / body / signature x N)
# with nested reply-quote chains (blockquote inside blockquote with
# attribution lines — the composition that stresses the '>' prefix
# seams at depth inside a repeating unit), inline code in posts,
# @-mention links, an edit-note in small, signature blocks separated
# by hr, and pagination chrome.  The thread lives in div.content
# amid forum chrome (breadcrumbs, moderation banner, reply box,
# pagination) that the cascade must exclude only where it sits
# outside the container: the reply-form and pagination sit INSIDE
# div.content on real forums and therefore render — pinning that the
# extractor's unit of selection is the container, not a semantic
# notion of "the posts".

REALISTIC_FORUM_THREAD = """
<html>
<head><title>Kernel panic after resume - HelpForum</title></head>
<body>
    <nav class="breadcrumbs"><a href="/">Home</a> &raquo; <a href="/c/linux">Linux</a> &raquo; Kernel panic after resume</nav>
    <div class="mod-banner"><p>This thread is archived. New replies are disabled.</p></div>
    <div class="content">
        <h1>Kernel panic after resume</h1>
        <div class="post" id="post-1">
            <p class="post-meta"><b>gnarlybit</b> wrote on 2024-11-02:</p>
            <p>After suspending, resume gives me a panic in <code>iwlwifi</code>.
            Full trace below. Anyone seen this on 6.11?</p>
            <pre><code>BUG: kernel NULL pointer dereference, address: 0000000000000038
RIP: 0010:iwl_mvm_mac_stop+0x4a/0x160 [iwlmvm]</code></pre>
            <hr>
            <p><small>Sent from my thinkpad &middot; dotfiles at <a href="https://example.com/~gnarly">~gnarly</a></small></p>
        </div>
        <div class="post" id="post-2">
            <p class="post-meta"><b>driverdev</b> wrote on 2024-11-03:</p>
            <blockquote>
                <p><b>gnarlybit</b> wrote:</p>
                <p>resume gives me a panic in <code>iwlwifi</code>.</p>
            </blockquote>
            <p>Known regression, see <a href="/t/9915">this thread</a>.
            Try <code>modprobe -r iwlmvm</code> before suspend as a workaround.</p>
            <p><small>edited 2024-11-03: added workaround</small></p>
        </div>
        <div class="post" id="post-3">
            <p class="post-meta"><b>gnarlybit</b> wrote on 2024-11-04:</p>
            <blockquote>
                <p><b>driverdev</b> wrote:</p>
                <blockquote>
                    <p><b>gnarlybit</b> wrote:</p>
                    <p>resume gives me a panic in <code>iwlwifi</code>.</p>
                </blockquote>
                <p>Try <code>modprobe -r iwlmvm</code> before suspend.</p>
            </blockquote>
            <p>That fixed it, thanks @<a href="/u/driverdev">driverdev</a>!
            Marking solved.</p>
        </div>
        <div class="reply-form">
            <p>Log in to reply. <a href="/login?next=/t/10021">Log in</a></p>
        </div>
        <div class="pagination"><p>Page 1 of 1</p></div>
    </div>
    <footer class="site-footer"><p>HelpForum &copy; 2024</p></footer>
</body>
</html>
"""

# round-5 twenty-fifth wave: charref termination edges and the email-
# layout macro page.  hostile-charref-nosemi pins html.parser's
# convert_charrefs semantics for NAMED references missing their
# semicolon (probed against the stdlib): the longest semicolon-less
# legacy entity prefix converts (&notit; -> "¬it;", &copy 2025 ->
# "© 2025", &ampx -> "&x", &lt3 -> "<3", &times2 -> "×2") while a
# name outside the legacy table stays literal (&unknownthing); and —
# the pinned html.parser-vs-browser DIVERGENCE — the SAME aggressive
# conversion applies inside attribute values, where HTML5 would keep
# a ref followed by '='/alnum literal: href="/q?a=1&not=2&copy=3"
# becomes "/q?a=1¬=2©=3".  The reference (bs4 on html.parser,
# convert_charrefs on) inherits exactly this, so the goldens pin
# reference parity, not browser behavior.  realistic-newsletter is
# the macro case a crawl of newsletter/mailing-list archives hits:
# 1999-style table layout (center + nested layout tables with
# width/bgcolor soup, spacer gifs, font tags), mso conditional
# comments (true comments -> vanish whole), inline styles everywhere,
# and no content-named div — the cascade falls through to largest-div
# election over the wrapper div, and every table flattens through the
# cell seam rules.

HOSTILE_CHARREF_NOSEMI = """
<html>
<body>
    <div class="content">
        <h1>Charref Termination</h1>
        <p>longest match: &notit; and &notin; differ by one table row.</p>
        <p>legacy no-semi: &copy 2025 Example Corp &middot press &para now.</p>
        <p>prefix chomp: &ampx &amp; &lt3 &gt9000 &times2 &divide2.</p>
        <p>not in the table: &unknownthing and &customref; stay literal.</p>
        <p><a href="/q?a=1&not=2&copy=3&amp=4&sect=5">query soup link</a></p>
        <p><img src="/i.png?w=100&cent=0&pound=1" alt="attr refs"></p>
        <p>trailing amp ends the document: money &amp savings &</p>
    </div>
</body>
</html>
"""

REALISTIC_NEWSLETTER = """
<html>
<head><title>Weekly Digest #42 - Example Letter</title></head>
<body bgcolor="#f4f4f4">
<!--[if mso]><style>.mso-only { display: block; }</style><![endif]-->
<center>
<table width="600" border="0" cellpadding="0" cellspacing="0" bgcolor="#ffffff">
  <tr><td align="center" style="padding: 12px;">
    <img src="https://cdn.example.com/logo.png" alt="Example Letter" width="120">
  </td></tr>
  <tr><td>
    <table width="100%" border="0" cellpadding="8" cellspacing="0">
      <tr><td>
        <div class="wrapper">
          <font face="Georgia" size="4"><b>This week in infrastructure</b></font>
          <p style="margin: 8px 0;">Hello reader, here is issue
          <b>#42</b> of the digest you subscribed to.</p>
          <table border="0" cellpadding="4"><tr>
            <td width="1"><img src="spacer.gif" width="1" height="1" alt=""></td>
            <td><p><a href="https://example.com/a1">Postgres 18 ships
            incremental view maintenance</a> &mdash; the headline feature
            explained in nine minutes.</p></td>
          </tr><tr>
            <td width="1"><img src="spacer.gif" width="1" height="1" alt=""></td>
            <td><p><a href="https://example.com/a2">A tour of columnar
            shuffle formats</a> &mdash; Arrow, ORC, and the in-between.</p></td>
          </tr></table>
          <p><font color="#888888" size="2">You receive this because you
          signed up at example.com. <a href="https://example.com/unsub?u=1&amp;c=9">
          Unsubscribe</a> &middot; <a href="https://example.com/archive">View
          in browser</a></font></p>
        </div>
      </td></tr>
    </table>
  </td></tr>
  <tr><td align="center"><p><small>&copy 2026 Example Letter, 1 Demo Way</small></p></td></tr>
</table>
</center>
</body>
</html>
"""

# round-5 twenty-third wave: three more MACRO composition pages — the
# realistic page architectures a web-scale crawl actually hits, each
# stressing a different cascade outcome.  The news front page has NO
# div named content/article (module soup -> largest-div wins the river
# of repeated story cards); the product page finds `div.content` amid
# commerce chrome (gallery, price block, spec table, review widgets);
# the wiki page pairs `div#content` with a floated infobox table and
# citation superscripts (the [1]-style footnote markers must survive
# as link text).

REALISTIC_NEWS = """
<!DOCTYPE html>
<html lang="en">
<head>
    <title>The Daily Example — Front Page</title>
    <script async src="/js/ads.js"></script>
</head>
<body>
    <div class="masthead"><h1>The Daily Example</h1>
        <ul class="edition-picker"><li>US</li><li>World</li></ul></div>
    <div class="nav-strip"><a href="/politics">Politics</a> <a href="/tech">Tech</a> <a href="/sport">Sport</a></div>
    <div class="river">
        <div class="story-card lead">
            <h2><a href="/story/1">Major Event Unfolds in Capital</a></h2>
            <p class="standfirst">Officials responded on Tuesday to the developing situation.</p>
            <span class="byline">By A. Reporter</span> <time>2 hours ago</time>
        </div>
        <div class="story-card">
            <h3><a href="/story/2">Markets Edge Higher</a></h3>
            <p>Shares rose for a third session as earnings beat forecasts.</p>
        </div>
        <div class="story-card">
            <h3><a href="/story/3">New Stadium Opens</a></h3>
            <p>Fans queued overnight for the opening fixture.</p>
        </div>
        <div class="story-card promo"><p>Subscribe for unlimited access</p></div>
        <div class="story-card">
            <h3><a href="/story/4">Science: Probe Reaches Orbit</a></h3>
            <p>The mission entered its mapping phase on schedule.</p>
        </div>
    </div>
    <div class="rail"><div class="widget weather">Partly cloudy, 21°</div>
        <div class="widget most-read"><ol><li><a href="/story/2">Markets Edge Higher</a></li><li><a href="/story/4">Probe Reaches Orbit</a></li></ol></div></div>
    <div class="page-footer"><small>© The Daily Example</small></div>
</body>
</html>
"""

REALISTIC_PRODUCT = """
<html>
<head><title>UltraWidget 3000 — ShopExample</title></head>
<body>
    <div id="site-chrome"><a href="/">ShopExample</a> <input placeholder="Search products"> <span class="cart">Cart (2)</span></div>
    <div class="breadcrumbs"><a href="/tools">Tools</a> › <a href="/tools/widgets">Widgets</a> › UltraWidget 3000</div>
    <div class="content product-page">
        <h1>UltraWidget 3000</h1>
        <div class="gallery"><img src="/img/uw3000-front.jpg" alt="UltraWidget 3000 front view"><img src="/img/uw3000-side.jpg" alt="side view"></div>
        <p class="price"><del>$49.99</del> <strong>$39.99</strong> <span class="badge">20% off</span></p>
        <p class="stock">In stock — ships in <b>24h</b>.</p>
        <h2>Overview</h2>
        <p>The UltraWidget 3000 combines a reinforced housing with a quiet drive, rated for continuous duty.</p>
        <h2>Specifications</h2>
        <table>
            <tr><th>Weight</th><td>1.2 kg</td></tr>
            <tr><th>Power</th><td>65 W</td></tr>
            <tr><th>Warranty</th><td>2 years</td></tr>
        </table>
        <h2>Reviews</h2>
        <div class="review"><p><strong>5/5</strong> — Solid build, quieter than my old unit.</p></div>
        <div class="review"><p><strong>4/5</strong> — Good value; the cable could be longer.</p></div>
    </div>
    <div class="also-bought"><h3>Customers also bought</h3><ul><li><a href="/p/78">WidgetOil</a></li><li><a href="/p/79">Carry Case</a></li></ul></div>
</body>
</html>
"""

REALISTIC_WIKI = """
<html>
<head><title>Exampleton - Encyclopedia</title></head>
<body>
    <div id="sidebar"><ul><li><a href="/wiki/Main">Main page</a></li><li><a href="/wiki/Random">Random</a></li></ul></div>
    <div id="content">
        <h1>Exampleton</h1>
        <table class="infobox">
            <tr><th colspan="2">Exampleton</th></tr>
            <tr><th>Country</th><td>Examplia</td></tr>
            <tr><th>Population</th><td>52,400 (2020)</td></tr>
            <tr><th>Founded</th><td>1741</td></tr>
        </table>
        <p><b>Exampleton</b> is a river town in western <a href="/wiki/Examplia">Examplia</a>, known for its
           mills.<sup class="reference"><a href="#cite1">[1]</a></sup> It grew rapidly after the
           railway arrived in 1862.<sup class="reference"><a href="#cite2">[2]</a></sup></p>
        <h2>History</h2>
        <p>Founded as a crossing post, the town chartered its first mill in 1745.</p>
        <h2>See also</h2>
        <ul><li><a href="/wiki/List_of_towns">List of towns in Examplia</a></li></ul>
        <h2>References</h2>
        <ol class="references">
            <li id="cite1">Smith, A. <i>Towns of the West</i>. Example Press, 1990.</li>
            <li id="cite2">Jones, B. "Rail and river". <i>Journal of Examplia</i>, 2004.</li>
        </ol>
    </div>
</body>
</html>
"""

# round-5 twenty-eighth wave: the non-Latin web.  Most of a real
# Common-Crawl shard is not English; these pin whole-document behavior
# for the two scripts that stress the renderer differently.  The CJK
# article has NO inter-word spaces, full-width punctuation (、。「」：
# ！), and CJK link/heading text — pinning that whitespace collapse,
# heading-space insertion, and Markdown link syntax never invent or eat
# characters inside unsegmented runs.  The Arabic page is dir="rtl" at
# the <html> level with Arabic-Indic digits (٠١٢), a tatweel-stretched
# word, and an embedded LTR English brand + URL — pinning that the
# pipeline is direction-agnostic byte plumbing (no reordering, no
# stripping of RTL codepoints) while the cascade still lands on
# div.content amid same-script chrome.
REALISTIC_ZH_ARTICLE = """
<!DOCTYPE html>
<html lang="zh-CN">
<head>
    <title>示例日报 — 河畔小镇的新桥落成</title>
    <meta charset="utf-8">
</head>
<body>
    <div class="site-nav"><a href="/shouye">首页</a> <a href="/guonei">国内</a> <a href="/keji">科技</a></div>
    <div class="content">
        <h1>河畔小镇的新桥落成</h1>
        <p class="byline">记者：王小明　发布时间：2026年8月19日</p>
        <p>经过三年建设，示例镇的新大桥于本周二正式通车。桥长约一千二百米，双向四车道，是该地区首座斜拉桥。</p>
        <p>镇长在仪式上说：「这座桥把河两岸连成了一个社区。」随后市民代表剪彩，现场响起掌声。</p>
        <h2>工程数据</h2>
        <ul>
            <li>总投资：３.２亿元（约合4500万美元）</li>
            <li>主跨：480米</li>
            <li>参建单位：<a href="/gongsi/qiaoliang">示例桥梁集团</a></li>
        </ul>
        <p>更多报道请见<a href="/zhuanti/xinqiao">新桥专题</a>。英文版见 <a href="/en/bridge">English edition</a>。</p>
    </div>
    <div class="page-footer"><small>© 示例日报　版权所有</small></div>
</body>
</html>
"""

REALISTIC_AR_RTL = """
<!DOCTYPE html>
<html lang="ar" dir="rtl">
<head>
    <title>مدونة المثال — رحلة إلى الواحة</title>
    <meta charset="utf-8">
</head>
<body>
    <div class="site-nav"><a href="/">الرئيسية</a> <a href="/safar">سفر</a> <a href="/tiqniya">تقنية</a></div>
    <div class="content">
        <h1>رحلة إلى الواحة</h1>
        <p>انطلقنا فجر يوم الجمعة من المدينة باتجاه الواحة، وقطعنا نحو ٢٤٠ كيلومترًا عبر طريق صحراوي مستقيم.</p>
        <p>توقفنا عند استراحة صغيرة اسمها «الكـــثيب» — اسم ممدود بالتطويل على اللافتة — وشربنا شايًا بالنعناع.</p>
        <h2>ملاحظات عملية</h2>
        <ul>
            <li>أفضل وقت للزيارة: من نوفمبر إلى مارس.</li>
            <li>التطبيق المستخدم للخرائط: <a href="https://maps.example.com/oasis">maps.example.com</a> (واجهة إنجليزية: Example Maps).</li>
            <li>تكلفة الوقود: ١٥٠ ريالًا تقريبًا.</li>
        </ul>
        <p>التفاصيل الكاملة في <a href="/safar/waha-2026">تدوينة الواحة</a>.</p>
    </div>
    <div class="page-footer"><small>جميع الحقوق محفوظة © مدونة المثال</small></div>
</body>
</html>
"""

# Numeric charrefs at the plane boundaries (wave 28): lone surrogates
# (&#xD800; — html.unescape yields U+FFFD), U+FFFF noncharacter and
# C0 controls (both swept by clean_text's control strip), the HTML5
# windows-1252 C1 remap table (&#x85; -> U+2026, &#x92; -> U+2019),
# &#0; -> U+FFFD, and real supplementary-plane codepoints (emoji,
# CJK-ext-B han) that must round-trip untouched through the DOM,
# renderer, parquet, and golden files.  Complements HOSTILE_ENTITY_RUNS
# (overflow refs) with the in-range-but-unassignable cases.
HOSTILE_CHARREF_PLANES = """
<html>
<body>
    <div class="content">
        <h1>Charref Planes</h1>
        <p>lone surrogates: hex &#xD800; dec &#56320; end</p>
        <p>swept: U+FFFF [&#xFFFF;] C0 [&#x01;&#x08;&#x1F;] end</p>
        <p>c1 remap: ellipsis &#x85; quote &#x92; dagger &#x86; euro &#x80;</p>
        <p>null byte: [&#0;] and [&#x00;]</p>
        <p>astral: emoji &#x1F600; han-ext-b &#x2A6D6; literal 😀𪛖</p>
        <p>bmp edge: &#xFFFD; and max bmp &#xFFFC;</p>
    </div>
</body>
</html>
"""

# round-5 thirty-second wave: developer-page staples (probed live).
# A language-classed code block (<pre><code class="language-python">)
# emits a BARE fence — markdownify consults the class only through an
# opt-in code_language_callback the reference never passes, so the
# pinned behavior is no language tag (and an inline code with the
# class stays an inline single-backtick span); headings, paragraphs
# and fenced pre inside a <blockquote> each take the `>` prefix with
# blank `>` seam lines between them — the block-composition surface of
# the quote renderer; and data: URIs survive VERBATIM in both image
# sources and link hrefs (base64 payload, percent-escapes and all —
# no URL handling mangles scheme-opaque refs).

HOSTILE_CODE_LANG = """
<html>
<body>
    <div class="content">
        <h1>Code Lang</h1>
        <pre><code class="language-python">def f(x):
    return x + 1</code></pre>
        <pre><code class="lang-sql">SELECT 1;</code></pre>
        <pre><code>plain block</code></pre>
        <p>inline <code class="language-js">x=&gt;x</code> stays inline</p>
    </div>
</body>
</html>
"""

HOSTILE_QUOTE_BLOCKS = """
<html>
<body>
    <div class="content">
        <h1>Quote Blocks</h1>
        <blockquote><h2>Quoted Heading</h2><p>quoted body text here.</p>
        <pre>quoted code
line two</pre></blockquote>
        <p>after the quote.</p>
    </div>
</body>
</html>
"""

HOSTILE_DATA_URI = """
<html>
<body>
    <div class="content">
        <h1>Data URI</h1>
        <p><img src="data:image/png;base64,iVBORw0KGgoAAA==" alt="inline png">
        and <a href="data:text/plain,hello%20world">a data link</a></p>
    </div>
</body>
</html>
"""

# round-5 thirty-third wave: the component-era crawl tail (each probed
# live before freezing; wave 22's hostile-custom-elements pins BARE
# unknown-tag handling — this wave pins real-widget COMPOSITIONS)
# live before freezing).  Custom elements (hyphenated web-component
# tags, AMP tags, embed wrappers) are TRANSPARENT — unknown elements
# render their children and contribute nothing themselves, so an
# <amp-img> with no children vanishes, a <lite-youtube> wrapper yields
# only its fallback link, and a non-anchor tag carrying an href=
# attribute is NOT a link (only real <a> makes links).  Lazy-load
# image patterns: an <img> whose real source hides in data-src renders
# the alt with the (possibly empty or placeholder) src attribute
# verbatim — ![alt]() for a src-less img — because the pipeline never
# guesses vendor lazy-load attributes, and the <noscript> twin of a
# lazy img DOES render (html.parser keeps noscript content in-tree,
# same in-tree rule as <template>, wave 9).  Developer-doc heading
# anchors: a Sphinx-style trailing headerlink stays an inline link
# inside the ATX heading (## Install[¶](#install)), an empty
# <a name> target vanishes with its padding trimmed, and a heading
# that IS a link renders as ## [text](href).

HOSTILE_COMPONENT_EMBEDS = """
<html>
<body>
    <div class="content">
        <h1>Component Embeds</h1>
        <my-card><h2>Card Title</h2><p>card body <strong>bold</strong></p></my-card>
        <amp-img src="/hero.jpg" alt="hero pic" width="300"></amp-img>
        <lite-youtube videoid="abc123"><a href="https://youtube.example/watch?v=abc123">watch the video</a></lite-youtube>
        <p>after <fancy-link href="/x.html">not a real link</fancy-link> widgets</p>
        <twitter-widget><blockquote><p>quoted tweet text</p><a href="https://t.example/s/1">link</a></blockquote></twitter-widget>
    </div>
</body>
</html>
"""

HOSTILE_LAZY_IMG = """
<html>
<body>
    <div class="content">
        <h1>Lazy Images</h1>
        <p>one <img data-src="/lazy1.jpg" alt="lazy no src"> here</p>
        <p>two <img src="data:image/gif;base64,R0lGOD" data-src="/lazy2.jpg" alt="placeholder src"> there</p>
        <noscript><img src="/real.jpg" alt="noscript real"></noscript>
        <p><img src="/eager.jpg" alt="eager" loading="lazy"></p>
    </div>
</body>
</html>
"""

HOSTILE_DOC_ANCHORS = """
<html>
<body>
    <div class="content">
        <h1>Doc Page</h1>
        <h2 id="install">Install<a class="headerlink" href="#install">¶</a></h2>
        <p>pip install it.</p>
        <h3>Usage <a name="usage"></a></h3>
        <p>run <code>cli --flag</code>.</p>
        <h2><a href="/next.html">Linked Heading</a></h2>
        <p>tail.</p>
    </div>
</body>
</html>
"""

# round-5 thirty-fourth wave: the autolink/title algebra and body
# metadata (each probed live before freezing).  Autolinks: an anchor
# whose collapsed text equals its href renders <url> — the comparison
# unescapes the markdown underscore escape first (markdownify's own
# rule, so /a_b_c autolinks), is CASE-SENSITIVE (HTTPS text over an
# HTTPS href still autolinks because both match), survives trailing
# whitespace in the source text (chomped before comparing), applies
# to mailto: exactly like http, and is DEFEATED by a title attribute
# (title forces the [text](href "title") form) or by display-text
# mismatch (dev@example.test over mailto: renders as a normal link).
# Titles: link and image titles render as the quoted third component
# with embedded double quotes backslash-escaped; an EMPTY title
# attribute is falsy and drops the component entirely; an img with
# title but no alt renders ![](src "title").  Body metadata must not
# leak: void <meta itemprop content=...> and <link itemprop> in the
# body contribute nothing (the content attribute is never text), an
# old-school comment-hidden script (<script><!-- ... //--></script>)
# strips with every other script since the comment markers are CDATA
# bytes inside it, while a <noscript>-wrapped 1x1 tracking pixel DOES
# render as an empty-alt image per the in-tree noscript rule (wave
# 33) — the pinned noise floor of real ad-tech markup.

HOSTILE_AUTOLINKS = """
<html>
<body>
    <div class="content">
        <h1>Autolinks</h1>
        <p><a href="https://example.test/a_b_c">https://example.test/a_b_c</a></p>
        <p><a href="https://example.test/t" title="x">https://example.test/t</a></p>
        <p><a href="mailto:dev@example.test">mailto:dev@example.test</a></p>
        <p><a href="mailto:dev@example.test">dev@example.test</a></p>
        <p><a href="https://example.test/sp">https://example.test/sp </a></p>
        <p><a href="HTTPS://example.test/case">HTTPS://example.test/case</a></p>
    </div>
</body>
</html>
"""

HOSTILE_LINK_TITLES = """
<html>
<body>
    <div class="content">
        <h1>Titles</h1>
        <p><a href="/x" title='tool "tip" here'>titled link</a></p>
        <p><img src="/i.png" alt="pic" title="hover text"> and <img src="/j.png" title="no alt"></p>
        <p><a href="/y" title="">empty title</a></p>
        <p>end.</p>
    </div>
</body>
</html>
"""

HOSTILE_BODY_METADATA = """
<html>
<body>
    <div class="content">
        <h1>Body Metadata</h1>
        <meta itemprop="ratingValue" content="4.9">
        <link itemprop="url" href="https://example.test/canonical">
        <script><!--
document.write('hidden');
//--></script>
        <p>visible paragraph.</p>
        <noscript><img src="https://tracker.example/px.gif?id=1" width="1" height="1"></noscript>
        <p>tail text.</p>
    </div>
</body>
</html>
"""

# round-5 thirty-fifth wave: container-seam edges (each probed live
# before freezing).  A <pre> whose CONTENT contains a ``` run emits it
# verbatim inside the emitted fence — broken Markdown by construction,
# exactly markdownify's behavior (no fence-collision escaping exists
# there); a <table> holding only a <caption> renders just the caption
# text and a fully empty <table> renders nothing; an <li> whose only
# child is a nested list renders the outer bullet and the first nested
# marker on ONE line (* + item — the bullet-cycle composition at a
# childless item); two sibling <ul>s stay SEPARATE lists across a
# blank-line seam (no merge); and only the FIRST thead row is the
# header — a second all-<th> row falls through to an ordinary body row
# below the delimiter.

HOSTILE_CONTAINER_SEAMS = """
<html>
<body>
    <div class="content">
        <h1>Container Seams</h1>
        <pre>code with ``` fence inside
and a second line</pre>
        <table><caption>only a caption</caption></table>
        <table></table>
        <ul><li><ul><li>only nested item</li></ul></li><li>plain item</li></ul>
        <ul><li>first list</li></ul>
        <ul><li>second list immediately after</li></ul>
        <table><thead><tr><th>h1</th><th>h2</th></tr><tr><th>second</th><th>header row</th></tr></thead>
        <tbody><tr><td>a</td><td>b</td></tr></tbody></table>
    </div>
</body>
</html>
"""

# round-5 thirty-sixth wave: quote-table seams, list interruption and
# the Indic web (each probed live before freezing).  A <table> inside
# a <blockquote> takes the `>` prefix on EVERY emitted table line
# (header, delimiter, body) with the blank-`>` seam before the next
# quoted block; an <hr> dropped between <li>s splits the rendering
# into list / --- / list (html.parser keeps the hr as a ul child, the
# renderer flushes the item runs around it) while both halves keep the
# same depth-0 marker; a mailto: href with ?subject/&body query
# survives verbatim; <ol start="9998"> rolls into 5-digit ordinals
# without disturbing the ". " seam.  Script diversity: an unsegmented
# Thai paragraph (no inter-word spaces — the whitespace collapse must
# not invent break points), Devanagari conjuncts + combining signs
# (no NFC applied) incl. inline bold inside the cluster run, and a
# raw-unicode Thai URL path kept verbatim.

HOSTILE_QUOTE_TABLE = """
<html>
<body>
    <div class="content">
        <h1>Quote Table</h1>
        <blockquote cite="https://src.example/q"><table><tr><th>h</th></tr><tr><td>cell</td></tr></table>
        <p>after table in quote.</p></blockquote>
        <ul><li>one</li><hr><li>two</li></ul>
        <p><a href="mailto:a@b.test?subject=Hello%20World&body=Hi">mail with subject</a></p>
        <ol start="9998"><li>big</li><li>bigger</li><li>rollover</li></ol>
    </div>
</body>
</html>
"""

# round-5 thirty-seventh wave: the markdown-INJECTION family (probed
# live before freezing) — link syntax characters arriving IN the
# source data.  The escape contract is exactly markdownify's: only *
# and _ are escaped in flow text; square brackets, parentheses and
# bang sequences pass through UNESCAPED even where they collide with
# the link syntax being emitted around them.  So a Wikipedia-style
# href with parentheses emits [text](/wiki/Tree_(data_structure)) —
# a technically broken link for strict CommonMark parsers — bracket
# characters inside link text or alt text emit verbatim (an alt of
# "](http://evil.test) payload" produces spoofed-looking markdown),
# and a link whose text looks like an image stays [![not an image]]
# (url).  Pinned as bytes so any future "fix" that starts escaping
# is caught as the byte-contract break it would be.

# round-5 thirty-eighth wave: the soft-404 MACRO page (probed live
# before freezing) — an error page served with HTTP 200, the crawl
# noise J58's soft_error_page_flags exists to catch downstream.  No
# content-named div, so largest-div elects the whole #app shell: nav
# links and the footer RIDE ALONG into the markdown, the error h1
# ("404") wins the title probe and the title-prepend quirk fires —
# producing the doubled "# 404" heading — the form renders only its
# button text, and the suggestion list survives as links.  Pinned
# because this is exactly what a production extraction of a soft-404
# looks like: structurally valid markdown that only a downstream
# quality/error filter can reject.

# round-5 fiftieth wave: raw-byte FENCE interiors and widget glue
# (probed live before freezing).  <pre> content BYPASSES the
# newline-convention normalization that flow text gets: CR and CRLF
# survive as raw bytes inside the fence ("line1\r\nline2\rline3" —
# the wave-22 CR->LF collapse is a flow-text rule, not a document
# rule; golden bytes prove the divergence); an SVG-style
# <a xlink:href> is NOT a link — the link handler consults only the
# plain href attribute, so the anchor strips to bare text; a
# <button> wrapping block content is transparent (its paragraphs
# and lists render as ordinary blocks); adjacent <button> siblings
# GLUE with no seam ("Tab1Tab2" — the tab-widget chrome shape);
# a hidden tab panel still renders (the hidden-attribute
# transparency pin composing with widget markup); and an <a name>
# carrying text renders the text with no link syntax (only EMPTY
# name anchors vanish).

HOSTILE_FENCE_BYTES_WIDGETS = """
<html>
<body>
    <div class="content">
        <h1>Fence Bytes And Widget Glue</h1>
        <pre>line1\r\nline2\rline3</pre>
        <svg><a xlink:href="/x">svg link text</a></svg>
        <button><p>para in button</p><ul><li>item</li></ul></button>
        <div role="tablist"><button>Tab1</button><button>Tab2</button></div>
        <div role="tabpanel">panel one</div>
        <div role="tabpanel" hidden>panel two</div>
        <p><a name="anchor">named anchor WITH text</a></p>
    </div>
</body>
</html>
"""

# round-5 fifty-first wave: pre-IN-list indentation and link-wrapping-
# BLOCK content (probed live before freezing).  A <pre> inside a list
# item emits an INDENTED fence (two-space continuation under the
# bullet, blank-line separated from the item's lead text — the only
# place a fence is not flush-left); an <a> wrapping block content
# inlines the blocks' rendered text INSIDE the link syntax, newlines
# and all ("[block para\n\n* item in link](/x)" — broken CommonMark,
# byte-pinned as the contract); an <a> wrapping a heading emits
# "[## heading](/y)" (hash markers swallowed into the link text),
# the mirror of the normal "## [link](/z)" when nesting is inverted;
# and an <a> wrapping a whole table carries the pipe rows into the
# link text.  These pins fence the inline-context propagation rule:
# block renderers never re-check whether an ancestor is a link.

HOSTILE_LIST_PRE_LINKBLOCK = """
<html>
<body>
    <div class="content">
        <h1>Pre In List, Block In Link</h1>
        <ul><li>intro<pre>code line1
code line2</pre>tail</li><li><p>para</p><pre>fenced in second</pre></li></ul>
        <a href="/x"><div><p>block inside link</p><ul><li>item in link</li></ul></div></a>
        <a href="/y"><h2>heading inside link</h2></a>
        <h2><a href="/z">link inside heading</a></h2>
        <a href="/t"><table><tr><th>h</th></tr><tr><td>c</td></tr></table></a>
    </div>
</body>
</html>
"""

# round-5 fifty-first wave, second case: RAWTEXT tail seams (probed
# live before freezing).  html.parser ends script rawtext at the FIRST
# "</script>" regardless of the old double-escape idiom, so
# "<script><!--<script>...</script>-->leaked?</script>" leaks
# "-->leaked?" into flow text (browsers' double-escaped state would
# swallow it — divergence pinned as bytes); a style body containing
# the SUBSTRING "</style" inside a quoted CSS string does NOT end the
# rawtext (no ">" after the tag name ends the end-tag open state
# here) so the whole rule stays css-stripped; <script
# type="text/template"> markup content is rawtext like any script —
# its <p> never reaches the tree; a SELF-CLOSED <script src="/x.js"/>
# does NOT swallow following content (html.parser honors the slash
# where browsers would not — divergence pinned); <svg><script> is
# dropped with its foreign subtree; and head-level <noscript> /
# <noframes> contribute nothing to the body.

HOSTILE_RAWTEXT_TAILS = """
<html>
<head><noscript><p>head noscript para</p></noscript><noframes>raw <b>noframes</b> body</noframes></head>
<body>
    <div class="content">
        <h1>Rawtext Tails</h1>
        <p>before script</p>
        <script><!--<script>var x=1;</script>-->leaked?</script>
        <p>mid</p>
        <style>p::before{content:"</style"}</style>
        <p>after style</p>
        <script type="text/template"><p>template para</p></script>
        <svg><script>var inSvg=1;</script><circle/></svg>
        <script src="/x.js"/><p>after self-closed script</p>
    </div>
</body>
</html>
"""

# round-5 fifty-second wave: ORPHAN table fragments and empty-URL
# asymmetry (probed live before freezing).  A <td>/<th>/<tr> with no
# table ancestor still runs the cell renderer — an orphan <td> emits
# the bare fragment " text |" (trailing pipe, no leading pipe), an
# orphan <tr> a full "| a | b |" row, an orphan <th> the same
# trailing-pipe fragment — pipe-table debris with no header/separator
# row, pinned as the foster-parenting-free contract (html.parser
# leaves misplaced cells in place; browsers would foster-parent).
# Empty URLs are ASYMMETRIC: <a href=""> unwraps to bare text (the
# empty-href gate) while <img src=""> still emits "![alt]()" — an
# image keeps its syntax with an empty target.  A no-href <a> also
# unwraps.  <marquee>/<blink> and a colon-named unknown tag
# (<foo:bar>) are transparent, gluing adjacent runs seamlessly.

HOSTILE_ORPHAN_CELLS = """
<html>
<body>
    <div class="content">
        <h1>Orphan Cells And Empty URLs</h1>
        <td>orphan cell text</td>
        <tr><td>orphan row cell a</td><td>cell b</td></tr>
        <th>orphan header</th>
        <p><a href="">empty href link</a> and <a>no href anchor</a></p>
        <p><img src="" alt="empty src"> stays image syntax</p>
        <marquee>scrolling text</marquee><blink>blinking</blink>
        <foo:bar>colon tag text</foo:bar>
        <p>tail</p>
    </div>
</body>
</html>
"""

# round-5 fifty-third wave: election SCOPE — which elements can carry
# the content marker at all (probed live before freezing).  The
# cascade's candidate set is structural, not universal: a div.content
# nested inside a table CELL is elected normally (the td/table chrome
# above it never leaks into the render; a sibling cell vanishes; an
# inner table inside the elected div still renders with the pinned
# padded empty-header row); the content CLASS on a <span> is
# invisible to election — with a decoy div present, largest-div
# fallback elects the decoy, the span's text is lost, and the absent
# h1 triggers the "# Webpage" default-title injection; and the
# content class on a <td> in a div-free document elects nothing at
# all — the whole page fails with the no_content status sentinel in
# every variant, the per-row error isolation surface of a page whose
# only marker sits on a non-candidate element.

HOSTILE_CONTENT_IN_CELL = """
<html>
<body>
    <table><tr><td><div class="content"><h1>In Cell</h1><p>content div inside a table cell</p><table><tr><td>inner table</td></tr></table></div></td><td>sibling cell never renders</td></tr></table>
</body>
</html>
"""

HOSTILE_NONCANDIDATE_CLASS = """
<html>
<body>
    <span class="content">span carries the magic class but is invisible to election</span>
    <div class="sidebar"><p>decoy div wins largest-div fallback</p></div>
</body>
</html>
"""

HOSTILE_CLASS_ON_TD = """
<html>
<body>
    <table><tr><td class="content"><p>cell content class</p></td><td>other</td></tr></table>
</body>
</html>
"""

# round-5 fifty-fourth wave: nested-LINK syntax and rule/emphasis
# containers (probed live before freezing).  html.parser does NOT
# auto-close an <a> when another <a> opens (browsers would), so a
# nested anchor emits nested link syntax byte-verbatim —
# "[outer [inner](/b) tail](/a)" — markdown no CommonMark parser
# reads as two links (divergence pinned as the contract, and the
# no_links variant flattens both layers to bare glued text); an
# emphasis element wrapping ONLY an image emits star-wrapped image
# syntax "*![alt](/src)*"; an <hr> inside a list item renders as an
# indented continuation rule under the bullet, and inside a
# blockquote as a quoted "> ---" line — both compositions downstream
# CommonMark re-interprets differently than a top-level rule.

HOSTILE_NESTED_LINKS = """
<html>
<body>
    <div class="content">
        <h1>Nested Links And Rule Containers</h1>
        <p><a href="/a">outer <a href="/b">inner link</a> tail</a></p>
        <p><em><img src="/i.png" alt="em img"></em> and <strong><img src="/j.png" alt="strong img"></strong></p>
        <ul><li>item<hr>after rule</li></ul>
        <blockquote><hr><p>quoted after rule</p></blockquote>
    </div>
</body>
</html>
"""

# round-5 fifty-fifth wave: pre NEWLINE edges and loose inter-item
# text (probed live before freezing).  The HTML5 tree builder strips
# the first newline after <pre> — html.parser does NOT, so
# "<pre>\ncode</pre>" emits a BLANK first fence line (divergence
# pinned; the browser-parity output would start at "code"), and a
# trailing newline before </pre> emits a blank LAST fence line
# symmetrically; loose text nodes between a container's block
# children render as their own blank-line-separated paragraphs; and
# loose text directly inside <ul> — before, between, and after the
# <li>s — stays in DOCUMENT position and GLUES onto the adjacent
# bullet markers ("loose in ul* item\nbetween items* two"), breaking
# the list syntax downstream: the list-flavored twin of the wave-12
# no-foster-parenting table pin.

HOSTILE_PRE_NEWLINE_LOOSE = """
<html>
<body>
    <div class="content">
        <h1>Pre Newlines And Loose Text</h1>
        loose text before blocks
        <p>para one</p>
        interstitial loose text
        <pre>
leading newline line
second</pre>
        <pre>trailing newline
</pre>
        <ul>loose in ul<li>item</li>between items<li>two</li>after</ul>
        trailing loose text
    </div>
</body>
</html>
"""

# round-5 fifty-sixth wave: fence-interior COMMENTS and cross-cell
# misnesting (probed live before freezing).  A comment inside <pre>
# vanishes with NO seam — "before<!--x-->after" emits the glued
# fence line "beforeafter"; an entity-encoded pipe (&#124;) lands as
# a live table-syntax byte in flow text and an entity-encoded
# backtick TRIPLE emits a live ``` run mid-paragraph (a fence-line
# injection the wave-46 single-backtick pin composes into); a <b>
# opened in one table cell and closed in the NEXT stays bounded —
# markers close at the first cell's seam ("a**bold spans**") and the
# dangling </b> in the second cell drops silently ("cellsplain"),
# so inline markers never leak across the cell flattener; an orphan
# <option> inside a div surfaces its text inline; and tab characters
# collapse to single spaces in flow text AND inside code SPANS
# (`code tab`) while <pre> alone preserves them — the three-way tab
# contract.

HOSTILE_FENCE_COMMENT_MISNEST = """
<html>
<body>
    <div class="content">
        <h1>Fence Comments And Cell Misnesting</h1>
        <pre>before<!-- comment in pre -->after</pre>
        <p>cell pipe entity &#124; here and fence entity &#96;&#96;&#96; run</p>
        <table><tr><td>a<b>bold spans</td><td>cells</b>plain</td></tr></table>
        <div>orphan <option>option text</option> in div</div>
        <p>tab\there and in <code>code\ttab</code></p>
    </div>
</body>
</html>
"""

# round-5 fifty-seventh wave: BLOCK elements inside <pre> (probed
# live before freezing).  html.parser gives <pre> no content-model
# enforcement, so block children parse as real elements and the
# renderer emits their full block markdown INSIDE the fence: a list
# contributes "* in pre" bullet lines, a table its pipe rows and
# padded empty header, a heading its "## " marker, a blockquote its
# "> " prefix — each with their blank-line seams AS FENCE INTERIOR
# LINES, so the fence body contains markdown a downstream renderer
# must treat as literal code; rawtext children (<style>/<script>)
# strip with NO seam ("a<style>..</style>b<script>..</script>c" ->
# the glued fence line "abc" — the rawtext twin of the wave-56
# comment glue).

HOSTILE_BLOCKS_IN_PRE = """
<html>
<body>
    <div class="content">
        <h1>Blocks In Pre</h1>
        <pre>a<style>p{color:red}</style>b<script>var x;</script>c</pre>
        <pre>list <ul><li>in pre</li></ul> table <table><tr><td>cell</td></tr></table> end</pre>
        <pre>head <h2>in pre</h2> quote <blockquote>quoted in pre</blockquote> done</pre>
    </div>
</body>
</html>
"""

# round-5 fifty-eighth wave: STRIKETHROUGH spanning blocks and
# fragment seams (probed live before freezing).  <del> wrapping
# sibling paragraphs emits ~~ markers SPANNING the blank-line seam
# ("~~para one\n\npara two~~" — the tilde twin of the wave-42
# emphasis-spanning-blocks pin, and equally broken CommonMark);
# <ins> wrapping a list is pure transparency — the bullets render
# markerless-ly with no ins trace; <template> content holding table
# FRAGMENTS (tr/td with no table) composes the in-tree template rule
# with the orphan-cell debris pin — a bare "| template row cell |"
# pipe row; and the label/optgroup tail renders its text with
# single-newline fragment seams (no blank line between the list,
# the pipe row, the label text, and the option text).

HOSTILE_STRIKE_FRAGMENTS = """
<html>
<body>
    <div class="content">
        <h1>Strike Spans And Fragment Seams</h1>
        <del><p>deleted para one</p><p>deleted para two</p></del>
        <ins><ul><li>inserted item</li></ul></ins>
        <template><tr><td>template row cell</td></tr></template>
        <label for="x">label text</label><input id="x" type="text" value="val">
        <optgroup label="group label text"><option>opt in div</option></optgroup>
        <p>end</p>
    </div>
</body>
</html>
"""

# round-5 fifty-ninth wave: ARTICLE-stage election order and the
# out-of-container title liftover (probed live before freezing).
# Among multiple <article>s the DOCUMENT-ORDER FIRST wins — even
# when a later article is larger (the article stage is first-match,
# not largest, unlike the largest-div fallback); a div.content beats
# an <article> appearing earlier in the document (class stage
# outranks article stage), and a div#content beats both; and in both
# losing-article cases the TITLE still comes from the article's h1 —
# the title probe is DOCUMENT-level (first h1 anywhere, reference
# scraper.py:363-387), so a container without its own h1 renders
# with a heading lifted from OUTSIDE the elected subtree, and the
# title-prepend quirk fires on it.

HOSTILE_ARTICLE_FIRST = """
<html>
<body>
    <article><h1>First Article</h1><p>short</p></article>
    <article><h1>Second Article</h1><p>much longer article body with many words</p></article>
</body>
</html>
"""

HOSTILE_CLASS_VS_ARTICLE = """
<html>
<body>
    <article><h1>Art</h1><p>article text</p></article>
    <div class="content"><p>content div text</p></div>
</body>
</html>
"""

HOSTILE_ID_VS_ARTICLE = """
<html>
<body>
    <div id="content"><p>id div</p></div>
    <article><h1>Art</h1><p>article text</p></article>
</body>
</html>
"""

# round-5 sixtieth wave: the Q&A MACRO page (probed live before
# freezing) — the developer-forum page family (Stack-Overflow shape)
# as one composition: vote-widget chrome GLUING around scores
# ("▲42▼", "58✓" — the wave-50 button-glue pin in its natural
# habitat), language-classed and bare code fences in question and
# answers, a comment list with per-comment author links, tag-link
# runs, an accepted-answer blockquote note, schema.org microdata and
# aria attributes transparent throughout, and the page chrome split
# exactly at the container boundary: nav/sidebar-ads/footer outside
# div.content never render while everything inside — votes, comments
# and all — rides along (the unit of selection is the container).

HOSTILE_QA_MACRO = """
<html>
<head><title>How do I repartition a DataFrame? - DevQA</title></head>
<body>
<nav id="nav"><a href="/">DevQA</a><a href="/questions">Questions</a><a href="/tags">Tags</a></nav>
<div class="container">
  <div class="content">
    <h1>How do I repartition a DataFrame?</h1>
    <div class="question" itemscope itemtype="https://schema.org/Question">
      <div class="vote-cell"><button aria-label="up">▲</button><span class="score">42</span><button aria-label="down">▼</button></div>
      <div class="post-body">
        <p>I have a skewed join and want to spread the hot key. I tried:</p>
        <pre><code class="language-python">df = df.repartition(32, "host")
out = df.join(dim, "host")</code></pre>
        <p>but one task still gets 90% of rows. What am I missing?</p>
        <div class="post-tags"><a class="tag" href="/t/spark">spark</a> <a class="tag" href="/t/joins">joins</a></div>
      </div>
      <div class="comments"><ul><li><span class="comment-text">Did you enable AQE?</span> – <a href="/u/1">ann</a></li><li><span class="comment-text">Show the plan with df.explain()</span> – <a href="/u/2">bo</a></li></ul></div>
    </div>
    <h2>2 Answers</h2>
    <div class="answer accepted" itemprop="acceptedAnswer">
      <div class="vote-cell"><span class="score">58</span><span class="checkmark" aria-label="accepted">✓</span></div>
      <div class="post-body">
        <p>Repartitioning by the skewed column keeps all rows of the hot key in <em>one</em> partition. Either salt the key:</p>
        <pre><code>df.withColumn("salt", (rand()*16).cast("int"))</code></pre>
        <p>or let AQE split it: set <code>spark.sql.adaptive.skewJoin.enabled</code> to <code>true</code>.</p>
        <blockquote><p>Note: broadcast the dim side if it fits — no shuffle at all.</p></blockquote>
      </div>
    </div>
    <div class="answer">
      <div class="post-body"><p>Also check <a href="https://spark.apache.org/docs/latest/sql-performance-tuning.html">the tuning guide</a>.</p></div>
    </div>
  </div>
  <div class="sidebar ads"><div class="ad-unit">SPONSORED: cloud credits</div><h3>Related</h3><ul><li><a href="/q/7">AQE not splitting</a></li></ul></div>
</div>
<footer><p>© DevQA 2025</p></footer>
</body>
</html>
"""

# round-5 sixty-first wave: entity-DECODED fence interiors and raw
# CR in attribute values (probed live before freezing).  Entities
# decode at parse time, so a fence interior carries the DECODED
# bytes: "&lt;div&gt;" emits a live-looking "<div>" inside the
# fence, "&amp;amp;" unescapes exactly one level to "&amp;", an
# entity-encoded newline (&#10;) injects a real fence-interior line
# break, and &#96;&#96;&#96; lands a live ``` run INSIDE the fence —
# the entity-encoded twin of the wave-35 literal-backtick pin,
# breaking the fence for downstream parsers.  Attribute values are
# EXEMPT from the flow-text CR->LF newline convention: a raw CR byte
# in an href (and a &#13; entity) survives into the markdown link
# destination "(/a\\rb)" — the attribute-side complement of the
# wave-50 fence-interior CR pin.

HOSTILE_ENTITY_FENCE_CR = """
<html>
<body>
    <div class="content">
        <h1>Entity Fences And CR Hrefs</h1>
        <pre>entity &lt;div&gt; and &amp;amp; and newline&#10;entity and fence &#96;&#96;&#96; in pre</pre>
        <p><a href="/a\rb">CR in href</a> and <a href="/c&#13;d">CR entity href</a></p>
        <p>decimal space&#32;entity and tab&#9;entity in flow</p>
    </div>
</body>
</html>
"""

# round-5 sixty-second wave: TITLE-element edges (probed live before
# freezing).  Among multiple head <title>s the FIRST wins the
# document-level probe (and, with no h1 anywhere, becomes the
# title-prepended heading — composing the wave-59 liftover with the
# title fallback chain h1 -> title -> "Webpage"); a <title> in BODY
# position renders its text as ordinary flow content (the wave-14
# no-RCDATA rule meeting the renderer: head metadata becomes body
# prose when misplaced) while losing the document-order probe to
# the earlier head title.

HOSTILE_TITLE_EDGES = """
<html>
<head><title>First Title</title><title>Second Title</title></head>
<body>
    <div class="content">
        <p>no h1 here</p>
        <title>body title text</title>
        <p>after body title</p>
    </div>
</body>
</html>
"""

# round-5 sixty-third wave: formula FLATTENING and the padded-header
# SUPPRESSION quirk (probed live before freezing).  MathML token
# runs glue structurelessly — "<mi>x</mi><mo>=</mo><mn>2</mn>" emits
# "x=2" and an <mfrac> glues numerator to denominator ("ab": the
# fraction bar is gone, the Wikipedia-formula information loss a
# downstream consumer must know about); svg <text>/<tspan>/<desc>
# glue the same way.  And the padded-empty-header rule is keyed to
# the table's FIRST CHILD: a plain headerless table gets the
# "| |\\n| --- |" padded header, but the SAME rows preceded by a
# <colgroup> or <caption> render with NO header and NO delimiter row
# at all — pipe rows downstream CommonMark will not even parse as a
# table (markdownify first-child heuristic, pinned as bytes).

HOSTILE_FORMULA_COLGROUP = """
<html>
<body>
    <div class="content">
        <h1>Formulas And Header Suppression</h1>
        <svg viewBox="0 0 10 10"><text x="1" y="1">svg text element</text><tspan>tspan run</tspan><desc>described</desc></svg>
        <math><mi>x</mi><mo>=</mo><mn>2</mn><mfrac><mi>a</mi><mi>b</mi></mfrac></math>
        <p>after math</p>
        <table><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>
        <table><colgroup><col><col></colgroup><tr><td>a</td><td>b</td></tr><tr><td>c</td><td>d</td></tr></table>
        <table><caption>cap</caption><tr><td>a</td><td>b</td></tr></table>
    </div>
</body>
</html>
"""

# round-5 sixty-fourth wave: the header-suppression BOUNDARY (probed
# live before freezing) — exactly which first children of <table>
# keep vs suppress the padded empty header: a <tbody> wrapper, a
# comment, and leading whitespace all KEEP the "| |\\n| --- |" pad
# (the heuristic sees through them to the first row), while a
# <script> first child SUPPRESSES header and delimiter exactly like
# wave-63's colgroup/caption — the complete boundary of the
# markdownify first-child probe, pinned so any future header-rule
# change surfaces as a byte break on both sides of the line.

HOSTILE_HEADER_BOUNDARY = """
<html>
<body>
    <div class="content">
        <h1>Header Suppression Boundary</h1>
        <table><tbody><tr><td>a</td></tr><tr><td>c</td></tr></tbody></table>
        <table><!-- c --><tr><td>a</td></tr><tr><td>c</td></tr></table>
        <table> <tr><td>a</td></tr></table>
        <table><script>var x;</script><tr><td>a</td></tr></table>
    </div>
</body>
</html>
"""

# round-5 sixty-fifth wave: ordinal CONTINUITY and caption-header
# interaction (probed live before freezing).  Ordered-list numbering
# is position-among-li-siblings, so interleaved non-li children
# split the rendering WITHOUT resetting the count — "1. a / mid /
# 2. b" (and with start=3 + an interjected nested <ul>: "3. a /
# * nested mid / 4. b") — standalone markdown lists a downstream
# parser renumbers from their first ordinal; a <caption> carrying
# BLOCK content renders its full block markdown (heading, list)
# above the table; and — extending the wave-63/64 suppression — a
# caption suppresses the header DELIMITER row even when the first
# row is a real all-th header: "| h |\\n| c |" with no "| --- |",
# rows downstream CommonMark no longer reads as a table at all.

HOSTILE_ORDINAL_CAPTION = """
<html>
<body>
    <div class="content">
        <h1>Ordinals And Captions</h1>
        <ol><li>a</li><div>mid</div><li>b</li></ol>
        <ol start="3"><li>a</li><ul><li>nested mid</li></ul><li>b</li></ol>
        <table><caption><h3>cap head</h3><ul><li>cap item</li></ul></caption><tr><th>h</th></tr><tr><td>c</td></tr></table>
    </div>
</body>
</html>
"""

# round-5 sixty-sixth wave: code-SPAN composition algebra (probed
# live before freezing).  A whitespace-only <code> vanishes entirely
# (the chomp leaves a bare double-space seam in the sentence);
# emphasis and links WRAPPING code spans compose markers outside the
# backticks (*`code`*, [`code`](/x) — the dev-docs staples); but a
# link INSIDE a code span loses its link markup entirely — `link in
# code` with the href gone — the code-SPAN twin of the wave-45
# fence link-strip asymmetry; and <strong> wrapping a heading emits
# "**#### heading**" — heading markers inside inline markers, the
# inverted composition of the wave-42 inline-wrapping-block pins.

HOSTILE_CODE_SPAN_ALGEBRA = """
<html>
<body>
    <div class="content">
        <h1>Code Span Algebra</h1>
        <p>ws code <code>   </code> only</p>
        <p><em><code>emphasized code</code></em> and <a href="/x"><code>code link</code></a></p>
        <p><code><a href="/y">link in code</a></code></p>
        <p><strong><h4>heading in strong</h4></strong>tail</p>
    </div>
</body>
</html>
"""

# round-5 sixty-seventh wave: code-span INTERIOR asymmetry (probed
# live before freezing) — which markup survives INSIDE a code span,
# completing wave 66: an <img> keeps full ![alt](src) syntax inside
# the backticks while links (wave 66) and <del> markers vanish —
# exactly the image-vs-link asymmetry wave 45 pinned for fences,
# reproduced at span level; <code>-in-<code> emits ONE backtick pair
# (no doubling, inner markers gone); and a nested <kbd> chord
# (<kbd><kbd>Ctrl</kbd>+<kbd>C</kbd></kbd>) wraps once as `Ctrl+C`.

HOSTILE_CODE_INTERIOR = """
<html>
<body>
    <div class="content">
        <h1>Code Span Interiors</h1>
        <p><code>img <img src="/i.png" alt="in code"> here</code></p>
        <p><code>outer <code>inner code</code> tail</code></p>
        <p><code>del <del>struck in code</del> tail</code></p>
        <p><kbd><kbd>Ctrl</kbd>+<kbd>C</kbd></kbd> chord</p>
    </div>
</body>
</html>
"""

# round-5 sixty-eighth wave: HEADING-interior flattening systematics
# (probed live before freezing) — what survives inside a heading
# line: code spans and emphasis keep their markers; a <pre> child
# flattens to an INLINE ``` pair with its newlines collapsed to
# spaces ("## pre ``` fence line two ``` after" — a fence-marker
# injection ON the heading line); a blockquote loses its ">" markers
# entirely; and a list flattens its bullets to inline "*" stars
# ("## list * item one * two after" — bytes downstream CommonMark
# reads as emphasis markers, not bullets).  Together with wave 45's
# table-in-heading pin this completes the one-line flattening
# contract: block STRUCTURE never survives a heading, block
# MARKER BYTES sometimes do.

HOSTILE_HEADING_INTERIOR = """
<html>
<body>
    <div class="content">
        <h1>Heading Interiors</h1>
        <h2>code <code>span</code> and <em>emph</em> inside</h2>
        <h2>pre <pre>fence line
two</pre> after</h2>
        <h2>quote <blockquote>quoted</blockquote> after</h2>
        <h2>list <ul><li>item one</li><li>two</li></ul> after</h2>
    </div>
</body>
</html>
"""

# round-5 sixty-ninth wave: table-CELL marker asymmetry (probed live
# before freezing) — the cell-flattener's survival table, the third
# corner of the container-asymmetry triangle: in a CELL an <img>
# drops to its bare alt text (no ![ ]( ) syntax — previously pinned
# only inside the wave-25 newsletter macro) while a link KEEPS full
# [text](href) syntax — the exact INVERSE of fences and code spans,
# where images keep syntax and links drop it (waves 45/66/67); a
# blockquote loses its ">" markers in a cell and <del> keeps its
# "~~" run.  One fixture, all four contrasts side by side.

HOSTILE_CELL_ASYMMETRY = """
<html>
<body>
    <div class="content">
        <h1>Cell Marker Asymmetry</h1>
        <table><tr><th>kind</th><th>val</th></tr>
        <tr><td><img src="/i.png" alt="cell img"></td><td><a href="/x">cell link</a></td></tr>
        <tr><td><blockquote>cell quote</blockquote></td><td><del>cell struck</del></td></tr>
        </table>
    </div>
</body>
</html>
"""

# round-5 seventieth wave: definition-INTERIOR prefix scope (probed
# live before freezing) — the ":   " definition prefix attaches to
# the FIRST emitted line only, so multi-line block content in a <dd>
# renders its continuation lines FLUSH-LEFT: a fence opens behind
# the prefix with its interior and closer unindented, a blockquote
# contributes ":   > quoted" on one line, a table leaves its
# delimiter and data rows hanging (wave 44 pinned this for
# list-in-dd; this pins the fence/quote/table completions); and
# <dt> interiors keep their markers — a heading dt emits "### term"
# above the colon line, an image dt full ![alt](src) syntax.

HOSTILE_DD_INTERIOR = """
<html>
<body>
    <div class="content">
        <h1>Definition Interiors</h1>
        <dl><dt><h3>term heading</h3></dt><dd><pre>fence in dd
line2</pre></dd>
        <dt>plain term</dt><dd><blockquote>quoted def</blockquote></dd>
        <dt><img src="/t.png" alt="term img"></dt><dd><table><tr><td>tbl in dd</td></tr></table></dd></dl>
    </div>
</body>
</html>
"""

# round-5 seventy-first wave: link-TEXT interior preservation
# (probed live before freezing) — the fourth corner of the container
# survival square, and the opposite extreme of heading flattening:
# link text preserves EVERY marker — ~~del~~ runs, a full MULTI-LINE
# fence inside the bracket pair ("[```\\nfence in link\\n```](/b)"),
# "> " blockquote prefixes, and an <hr> with its surrounding blank
# lines ("[text \\n\\n---\\n\\n rule inside](/d)") — bracket pairs
# spanning blank lines that no CommonMark parser will read as one
# link, pinned as the inline-context propagation contract at its
# most extreme.

HOSTILE_LINKTEXT_INTERIOR = """
<html>
<body>
    <div class="content">
        <h1>Link Text Interiors</h1>
        <p><a href="/a"><del>struck link text</del></a> and <a href="/b"><pre>fence in link
two</pre></a></p>
        <p><a href="/c"><blockquote>quote in link</blockquote></a></p>
        <p><a href="/d">text <hr> rule inside</a></p>
    </div>
</body>
</html>
"""

# round-5 seventy-second wave: ordered-item CONTINUATION indent and
# the whitespace-href asymmetry (probed live before freezing).
# Block content under an ordered item indents THREE spaces (the
# "1. " marker width — fences and loose sibling paragraphs both,
# the ordered twin of wave 51's two-space bullet continuation); and
# an href of ONLY whitespace is NOT the empty-href unwrap case:
# "<a href='   '>" emits "[text](   )" with the spaces as the link
# destination — the empty string unwraps (wave 52) but whitespace
# survives into the parens, completing the href-edge contract.

HOSTILE_ORDERED_CONTINUATION = """
<html>
<body>
    <div class="content">
        <h1>Ordered Continuation And WS Hrefs</h1>
        <ol><li>step<pre>fence under number
line2</pre></li><li>next</li></ol>
        <p><a href="   ">ws-only href</a></p>
        <ol><li><p>loose para</p><p>second para</p></li><li>tight</li></ol>
    </div>
</body>
</html>
"""

# round-5 seventy-third wave: marker-WIDTH indent rollover (probed
# live before freezing).  Ordered-item continuation indent equals
# the rendered marker width, so one list spanning the 9 -> 10
# rollover indents its continuations THREE spaces for single-digit
# items and FOUR for double-digit ones — internally inconsistent
# continuation columns inside a single list (composes with wave
# 36's 5-digit ordinal pin; CommonMark reads both, but any
# byte-level downstream diff keys on the wobble).

HOSTILE_MARKER_WIDTH = """
<html>
<body>
    <div class="content">
        <h1>Marker Width Rollover</h1>
        <ol start="8"><li>item 8<p>cont 8</p></li><li>item 9<p>cont 9</p></li><li>item 10<p>cont 10</p></li><li>item 11<p>cont 11</p></li></ol>
    </div>
</body>
</html>
"""

# round-5 seventy-fourth wave: ORPHAN structural elements (probed
# live before freezing) — the dl-free twin of wave 52's table-cell
# debris: an orphan <dt>/<dd> pair outside any <dl> still emits the
# full definition shape ("orphan dt\\n:   orphan dd" — renderers are
# element-scoped, never container-scoped), while orphan <summary>/
# <figcaption>/<legend>/<caption> render as transparent text runs
# joined by single-newline seams.

HOSTILE_ORPHAN_STRUCTURAL = """
<html>
<body>
    <div class="content">
        <h1>Orphan Structural Elements</h1>
        <summary>orphan summary</summary>
        <figcaption>orphan figcaption</figcaption>
        <legend>orphan legend</legend>
        <caption>orphan caption</caption>
        <dt>orphan dt</dt>
        <dd>orphan dd</dd>
        <p>tail</p>
    </div>
</body>
</html>
"""

# round-5 seventy-fifth wave: phantom-COLUMN header inflation
# (probed live before freezing).  A HEADERLESS outer table holding a
# nested table takes the padded empty header as usual — but the pad
# WIDTH is computed from the flattened first row, whose cell text
# now contains the INNER table's pipe characters, so a two-cell row
# pads a FOUR-column header ("| | | |") whose delimiter row then
# disagrees with every data row: the nested-table pipe-soup contract
# at its sharpest, where the wave-12 padded-header rule and the
# wave-31 cell-flattening seam multiply instead of composing.

HOSTILE_PHANTOM_COLUMNS = """
<html>
<body>
    <div class="content">
        <h1>Phantom Columns</h1>
        <table><tr><td>
        <table><tr><th>inner h</th></tr><tr><td>inner cell</td></tr></table>
        </td><td>sibling</td></tr></table>
    </div>
</body>
</html>
"""

# round-5 seventy-sixth wave: blockquote PRESERVATION systematics
# (probed live before freezing) — the capstone of the container
# survival square: blockquotes preserve EVERY block structure under
# per-line "> " prefixes — headings with markers, nested quotes as
# "> > ", fences line-by-line, full pipe tables with their delimiter
# rows, and ordered items whose continuation composes BOTH prefixes
# (">    cont": the quote prefix plus the three-space marker-width
# indent — waves 32/36 pinned the pieces; this pins the whole
# square's preserving corner in one fixture).

HOSTILE_QUOTE_PRESERVATION = """
<html>
<body>
    <div class="content">
        <h1>Quote Preservation</h1>
        <blockquote>plain quoted
        <h2>heading in quote</h2>
        <blockquote>deeper</blockquote>
        <pre>fence
in quote</pre>
        <table><tr><th>qh</th></tr><tr><td>qc</td></tr></table>
        <ol><li>q item<p>cont</p></li></ol>
        </blockquote>
    </div>
</body>
</html>
"""

# round-5 seventy-seventh wave: EMPTY-row table debris (probed live
# before freezing).  A cell-less <tr> mid-table emits a bare "|"
# line and a row of empty cells "|  |  |" (two-space interiors) —
# ragged non-row lines inside an otherwise well-formed pipe table
# (sharpening wave 46's short/overflow ragged-row pins to the
# zero-cell limit); empty and whitespace-only <li> vanish without
# bare bullets while their real sibling keeps its marker.

HOSTILE_EMPTY_ROWS = """
<html>
<body>
    <div class="content">
        <h1>Empty Row Debris</h1>
        <table><tr><th>a</th><th>b</th></tr><tr></tr><tr><td></td><td></td></tr><tr><td>x</td><td>y</td></tr></table>
        <ul><li></li><li>real</li><li>  </li></ul>
        <p>tail</p>
    </div>
</body>
</html>
"""

# round-5 seventy-eighth wave: hard-break treatment BY CONTAINER
# (probed live before freezing) — wave 40 pinned <br> inside fences/
# spans/links/quotes; this pins the four remaining containers, each
# with a DIFFERENT verdict: in a heading the br vanishes with GLUE
# ("## brin heading" — no space, no break); in a list item it emits
# the two-space break plus the item's continuation indent
# ("br  \\n  in item"); in a <dt> it becomes a single SPACE; in a
# <dd> it keeps the break but the continuation lands FLUSH-LEFT
# outside the ':   ' prefix — four containers, four rules, one
# fixture.

HOSTILE_BR_CONTAINERS = """
<html>
<body>
    <div class="content">
        <h1>Br By Container</h1>
        <p>soft<br/>break <em>then <br> inside em</em></p>
        <h2>br<br>in heading</h2>
        <ul><li>br<br>in item</li></ul>
        <dl><dt>br<br>in term</dt><dd>br<br>in def</dd></dl>
    </div>
</body>
</html>
"""

# round-5 forty-ninth wave: heading-HASH and rule-text collisions
# (probed live before freezing).  Source text whose bytes collide
# with ATX/thematic syntax at line level: a heading whose text ENDS
# in " ##" emits "## head ##" — a closing-hash sequence that
# downstream CommonMark parses as heading text "head", silently
# truncating the real content (nothing is escaped — #, like every
# non-*/_ metacharacter, passes verbatim); a leading "# " inside an
# h2 emits "## # lead"; a paragraph of bare "---" emits a line
# indistinguishable from the <hr> rendering (thematic-break
# injection) and "===" under a paragraph forms a setext-heading
# trap — both pass byte-verbatim per the markdownify escape
# contract already pinned for inline metacharacters.

HOSTILE_HEADING_HASH = """
<html>
<body>
    <div class="content">
        <h1>Heading Hash Collisions</h1>
        <h2>head ##</h2>
        <h2># lead</h2>
        <h2>mid # hash</h2>
        <p>---</p>
        <p>previous line</p>
        <p>===</p>
    </div>
</body>
</html>
"""

# round-5 forty-eighth wave: election-vs-EXCLUSION order (probed
# live before freezing) — the pipeline-composition pins.  Container
# election runs BEFORE selector exclusion: a div.content nested
# inside an excluded-class ancestor still wins and renders fully
# under the exclude variant (the sweep never looks above the
# elected root); a container whose OWN class list matches an
# exclude selector is immune — the sweep removes matches INSIDE the
# container, never the container itself; a container whose entire
# interior matches the exclude selector renders to nothing and pins
# the render_empty status under the exclude variant while the
# default variant keeps the text (the one case in this fixture
# where the two variants diverge in STATUS, not just bytes); and an
# img-only FIRST h1 yields the empty-string title via the strip-all
# title probe — beating a real second h1 — while the h1 itself
# still renders its alt text as a heading.

HOSTILE_ELECTION_ORDER = """
<html>
<body>
    <div class="ads"><div class="content"><h1>Inside Ads</h1><p>election beats ancestor exclusion</p></div></div>
</body>
</html>
"""

HOSTILE_SELF_EXCLUDE = """
<html>
<body>
    <div class="content ads"><h1>Self Match</h1><p>container immune to its own selector</p>
        <div class="ads">interior ad stripped under exclude</div>
    </div>
</body>
</html>
"""

HOSTILE_EXCLUDE_ALL_INTERIOR = """
<html>
<body>
    <div class="content"><div class="ads"><p>only child</p></div></div>
</body>
</html>
"""

HOSTILE_IMG_ONLY_TITLE = """
<html>
<body>
    <div class="content"><h1><img src="/l.png" alt="Logo Alt"></h1><h1>Second H1</h1><p>tail</p></div>
</body>
</html>
"""

# round-5 forty-seventh wave: list-INDENT and attribute-transparency
# edges (probed live before freezing).  An <ol> nested in an <ol>
# item indents its own numbering three spaces under the parent
# ordinal ("1. one\n   1. nested" — the ordered twin of the ul
# bullet cycle); an href with literal edge whitespace emits it INTO
# the destination parens ("[padded href](  /padded  )" — a broken
# CommonMark destination pinned verbatim, the attribute-value
# preservation contract applied to link targets); an inline
# style="display:none" is NEVER consulted — the span's text renders
# (the CSS twin of the hidden-attribute and aria-hidden pins); and
# an <img src="#"> renders the fragment-only source verbatim
# (![hash src](#)).

HOSTILE_LIST_INDENT_ATTR = """
<html>
<body>
    <div class="content">
        <h1>List Indent And Transparency</h1>
        <ol><li>one<ol><li>nested</li></ol></li><li>two</li></ol>
        <p><a href="  /padded  ">padded href</a></p>
        <p><span style="display:none">invisible?</span> visible</p>
        <p><img src="#" alt="hash src"></p>
    </div>
</body>
</html>
"""

# round-5 forty-sixth wave: entity-COLLISION algebra (probed live
# before freezing).  Entity-produced markdown metacharacters join
# the escape contract exactly like literal ones — &#42; and &#95;
# escape to \\* and \\_ in flow text — BUT &#96; emits a bare
# backtick that a downstream CommonMark parser reads as a live code
# span (`tick` — backtick is outside the star/underscore-only
# escape set: an entity-encoded injection surface pinned verbatim);
# a <code> whose content IS one backtick glues wrapper+content into
# ``` (three backticks, broken CommonMark); double-encoded text
# (&amp;lt;) unescapes exactly ONE level to the literal string
# "&lt;p&gt;" while single-encoded &lt;b&gt; lands as live-looking
# "<b>not bold</b>" TEXT in the markdown — inline HTML to any
# downstream renderer; code-span edge whitespace is TRIMMED
# (`padded`), unlike the verbatim interior contract; and ragged
# tables stay ragged — a short row emits fewer cells than the
# header, an over-long row overflows it, no padding or truncation.

HOSTILE_ENTITY_COLLISION = """
<html>
<body>
    <div class="content">
        <h1>Entity Collisions</h1>
        <p>&#42;not em&#42; vs *esc* and &#95;und&#95; vs _u_</p>
        <p>&#96;tick&#96; and <code>&#96;</code></p>
        <p>&amp;lt;p&amp;gt; shows literal &lt;b&gt;not bold&lt;/b&gt;</p>
        <p><code>  padded  </code>x</p>
        <table><tr><th>a</th><th>b</th></tr><tr><td>1</td></tr><tr><td>1</td><td>2</td><td>3</td></tr></table>
    </div>
</body>
</html>
"""

# round-5 forty-fifth wave: fence and heading FLATTENING (probed
# live before freezing).  Inside <pre>, markup is flattened
# ASYMMETRICALLY: an <a> strips to bare text ("see the doc here")
# while an <img> keeps its full markdown syntax inside the fence
# ("before ![pic](/i.png) after") — the link/image conversion rules
# diverge in code context; a <pre> nested in a <pre> emits a fence
# INSIDE the outer fence (broken fence structure verbatim); a
# heading WRAPPING a table flattens the whole table into the one
# heading line ("## head | | | --- | | cell | tail" — heading line
# discipline wins over table layout); a heading inside a heading
# loses its markers and glues ("## outerinnertail"); a code span
# whose content starts or ends with a backtick collides with the
# single-backtick wrap (``lead` / `trail`` — ambiguous CommonMark
# verbatim); code-wrapped newlines inside <pre><code> survive as
# blank interior fence lines; and an empty <blockquote> vanishes.
# Pinned as bytes so any normalization of these collisions is
# caught as the byte-contract break it would be.

HOSTILE_FENCE_FLATTEN = """
<html>
<body>
    <div class="content">
        <h1>Fence And Heading Flattening</h1>
        <pre>see <a href="/doc">the doc</a> here</pre>
        <pre>before <img src="/i.png" alt="pic"> after</pre>
        <pre>outer <pre>inner</pre> tail</pre>
        <h2>head <table><tr><td>cell</td></tr></table> tail</h2>
        <h2>outer <h3>inner</h3> tail</h2>
        <p><code>`lead</code> and <code>trail`</code></p>
        <pre><code>\nx\n</code></pre>
        <blockquote></blockquote>
        <p>after all</p>
    </div>
</body>
</html>
"""

# round-5 forty-fourth wave: row-HEADER tables and definition
# composition (probed live before freezing).  The wiki-infobox
# staple with row-scope headers — every row "<th>key</th><td>val"
# — does NOT promote its first row to the markdown header: header
# election needs an all-th first row (or thead), so the mixed th+td
# row falls through to the padded-empty-header shape with every
# key/val pair a body row; a link wrapping image AND text renders
# both inside one bracket pair ([![pic](/i.png) caption text](/x));
# an empty <ul> contributes nothing and an empty <li> vanishes
# entirely — no bare bullet; two <tbody> sections merge seamlessly
# into one row run; a <dl> nested inside a <dd> flattens its term
# into the definition chain (outer\n:   inner\n:   deep def — the
# inner term rides a ":" line); and a <ul> inside a <dd> puts only
# the FIRST item on the ":   " indent while following items fall
# back to column zero (":   * one\n* two" — broken alignment
# emitted verbatim).  Pinned as bytes so header-election or
# dd-indent "fixes" surface as the byte breaks they would be.

HOSTILE_ROW_HEADERS_DL = """
<html>
<body>
    <div class="content">
        <h1>Row Headers And Definitions</h1>
        <table><tr><th>key</th><td>val1</td></tr><tr><th>k2</th><td>val2</td></tr></table>
        <p><a href="/x"><img src="/i.png" alt="pic"> caption text</a></p>
        <ul></ul>
        <p>mid</p>
        <ul><li></li><li>real</li></ul>
        <table><tbody><tr><td>a</td></tr></tbody><tbody><tr><td>b</td></tr></tbody></table>
        <dl><dt>outer</dt><dd><dl><dt>inner</dt><dd>deep def</dd></dl></dd></dl>
        <dl><dt>term</dt><dd><ul><li>one</li><li>two</li></ul></dd></dl>
    </div>
</body>
</html>
"""

# round-5 forty-third wave: attribute-VALUE and sequence edges
# (probed live before freezing).  <ol start> algebra: start="0"
# renders a zero-based ordinal ("0. zero"), while negative and
# non-numeric start values fall back to 1 — only a nonnegative
# integer parse is honored; a stray </br> END tag drops silently
# (html.parser emits an unmatched end tag, the renderer has no
# handler) while <br/> startendtag breaks normally — so "a</br>b"
# glues to "ab"; a whitespace-only <pre> still emits the fence PAIR
# around a blank interior line (``` / blank / ```) rather than
# vanishing like an empty inline; a <caption> arriving AFTER the
# rows renders below the table joined by a single newline (caption
# emission is document-order, not spec-order hoisting); and an <li>
# wrapped in a <div> inside its <ul> renders as a normal bullet —
# block wrappers are transparent inside list containers (no
# orphan-li dash, since the ancestor list is still found).

HOSTILE_VALUE_SEQUENCE = """
<html>
<body>
    <div class="content">
        <h1>Value And Sequence</h1>
        <ol start="0"><li>zero</li></ol>
        <ol start="-3"><li>neg</li></ol>
        <ol start="x"><li>alpha</li></ol>
        <p>a</br>b<br/>c</p>
        <pre>   \n\t\n</pre>
        <table><tr><td>r1</td></tr><caption>late caption</caption></table>
        <ul><div><li>wrapped item</li></div></ul>
    </div>
</body>
</html>
"""

# round-5 forty-second wave: inline-WRAPPING-block algebra (probed
# live before freezing) — block elements nested inside inline
# containers, the shape html.parser's no-implied-close parsing keeps
# in the tree exactly as written.  An <em> wrapping paragraphs emits
# its markers AROUND the blank-line seam (*para inside em\n\nsecond*
# — emphasis opening in one paragraph and closing two blocks later,
# broken CommonMark verbatim); an <em> wrapping a table emits *lead
# ... | cell |* with the closing marker after the table's last pipe;
# a <p> inside a <span> inside a <p> splits the outer paragraph at
# the block boundary ("before span / para in span / tail after" as
# three blocks — inline wrappers contribute no seam of their own); a
# heading inside an unclosed <p> renders as its own block mid-flow;
# an <a> wrapping an <li> puts the bullet marker INSIDE the link
# text ([* linked item](/x) — the list-flavored twin of the wave-31
# card pattern); a <dd> with no preceding <dt> renders its lonely
# ":   definition" shape and a trailing <dt> falls through to plain
# text; and an empty <table> contributes nothing.  Bonus pins: the
# seam between two inline-wrapped blocks is a SINGLE newline
# (second*\n*lead — the wrappers swallow the blank line), the
# no_links unwrap drops the bullet marker WITH the link markup
# ("linked item" bare), and the hs_* heading-space variants stack
# their inserted blanks before the mid-flow heading.  Pinned as
# bytes so a future "fix" that closes inline markers at block seams
# is caught as the byte break it would be.

HOSTILE_INLINE_WRAP_BLOCK = """
<html>
<body>
    <div class="content">
        <h1>Inline Wrapping Block</h1>
        <p>before <span>span <p>para in span</p> tail</span> after</p>
        <em><p>para inside em</p><p>second</p></em>
        <em>lead<table><tr><td>cell</td></tr></table></em>
        <p>start <h2>head in p</h2> end</p>
        <ul><a href="/x"><li>linked item</li></a></ul>
        <dl><dd>lonely definition</dd><dt>term after</dt></dl>
        <table></table>
        <p>after all</p>
    </div>
</body>
</html>
"""

# round-5 forty-first wave: emphasis-ADJACENCY algebra (probed live
# before freezing) — inline runs whose markers collide when rendered
# side by side.  Adjacent same-tag siblings fuse ambiguously
# (<em>a</em><em>b</em> -> *a**b*, which CommonMark parses as ONE
# emphasis around "a**b"; <strong> pairs -> **c****d**); same-tag
# NESTING doubles the markers (<strong><strong>y -> ****y****, and
# an inner <strong> inside outer strong TEXT emits **out **in**
# tail** — both broken CommonMark emitted verbatim, markdownify's
# own non-behavior); adjacent code spans fuse into what parses as
# one span with interior backticks (`a``b`); whitespace-edged
# siblings survive via the chomp migration (*a*  *b* — the moved
# spaces keep the runs apart); an image-only <li> renders bullet +
# image with no placeholder text — and under no_images the DOM-level
# strip removes the img BEFORE rendering, so the emptied item
# vanishes bullet and all; and tight pre<em>mid</em>post
# emits *mid* flush against both neighbors (legal but
# intraword-ambiguous).  Pinned as bytes so any future "fix" that
# inserts separators or merges markers is caught as the byte break
# it would be.

HOSTILE_EM_ADJACENCY = """
<html>
<body>
    <div class="content">
        <h1>Emphasis Adjacency</h1>
        <p><em>a</em><em>b</em> and <strong>c</strong><strong>d</strong></p>
        <p><em><em>x</em></em> <strong><strong>y</strong></strong></p>
        <p><strong>out <strong>in</strong> tail</strong></p>
        <p><code>a</code><code>b</code></p>
        <p><em>a </em><em> b</em></p>
        <p>pre<em>mid</em>post</p>
        <ul><li><img src="/i.png" alt="pic"></li><li>text</li></ul>
    </div>
</body>
</html>
"""

# round-5 fortieth wave: hard-break SEAMS (probed live before
# freezing) — <br> colliding with every container whose markdown has
# its own line discipline.  Inside <pre> the br renders as the
# two-space hard break INSIDE the code fence ("line one  \n"),
# trailing spaces in fenced code being markdownify's own non-behavior
# (and a <b> inside pre loses its markers entirely — fence content is
# plain text); inside a code SPAN the break splits the single-backtick
# span across lines (`x  \ny`); inside <em> the markers SPAN the
# break (*a  \nb* — the emphasis opens on one line and closes on the
# next, broken CommonMark emitted verbatim); inside link TEXT the
# break lives inside the brackets ([line  \nbreak text](/x)); inside
# a blockquote every continuation line takes its own "> " prefix
# after the two-space break; and a br at a paragraph EDGE (leading or
# trailing) is chomped to nothing by the same whitespace discipline
# that migrates edge whitespace out of inline markers.  Under the
# no_links unwrap the br inside the link text vanishes WITH the link
# markup ("linebreak text") — replace-with-text keeps only the text
# nodes, the reference's unwrap semantics exactly.  Pinned as
# bytes so any renderer change that "fixes" the broken-CommonMark
# emissions is caught as the byte-contract break it would be.

HOSTILE_BR_SEAMS = """
<html>
<body>
    <div class="content">
        <h1>Break Seams</h1>
        <pre>line one<br>line two<br><b>bold in pre</b></pre>
        <p><code>x<br>y</code></p>
        <p><em>a<br>b</em> and <strong>c<br>d</strong></p>
        <p><a href="/x">line<br>break text</a></p>
        <blockquote>q line<br>q next</blockquote>
        <p><br>leading edge</p>
        <p>trailing edge<br></p>
    </div>
</body>
</html>
"""

# round-5 thirty-ninth wave: mid-article inline litter (probed live
# before freezing) — the modern monetization/engagement widgets that
# live INSIDE the content container, where the cascade cannot save
# you and only explicit exclusion selectors (D1) can.  Default
# variant: the consent prompt, its button text, the infinite-scroll
# "Loading more" line and the `.ads`-classed inline unit ALL ride
# along into the markdown (an empty sentinel div and a childless
# <amp-ad> contribute nothing); exclude variant (.ads/#nav): the ads
# unit vanishes while the unmatched litter still rides — exclusion is
# selector-exact, not semantic.

HOSTILE_INLINE_LITTER = """
<html>
<body>
    <div class="content">
        <h1>Article</h1>
        <p>First paragraph of the story.</p>
        <div class="inline-consent">We value your privacy. Accept cookies to continue reading. <button>Accept All</button></div>
        <p>Second paragraph continues here.</p>
        <div class="ads">Sponsored: <a href="https://ads.example/click?id=7">Buy the thing</a></div>
        <div class="infinite-scroll-sentinel" data-page="2"></div>
        <p>Loading more stories...</p>
        <amp-ad width="300" height="250" type="doubleclick"></amp-ad>
        <p>Final paragraph.</p>
    </div>
</body>
</html>
"""

HOSTILE_SOFT_404 = """
<html>
<head><title>Page Not Found - Example Site</title></head>
<body>
    <div id="app">
        <nav class="nav"><a href="/">Home</a> <a href="/shop">Shop</a></nav>
        <div class="error-page">
            <h1>404</h1>
            <h2>Oops! Page Not Found</h2>
            <p>The page you are looking for might have been removed or is
            temporarily unavailable.</p>
            <form action="/search"><input type="text" name="q" placeholder="Search..."><button>Search</button></form>
            <p>Try these popular pages instead:</p>
            <ul><li><a href="/shop/deals">Today's Deals</a></li>
            <li><a href="/help">Help Center</a></li></ul>
        </div>
        <footer class="footer"><p>© 2026 Example Site</p></footer>
    </div>
</body>
</html>
"""

HOSTILE_MD_INJECTION = """
<html>
<body>
    <div class="content">
        <h1>Injection</h1>
        <p><a href="/wiki/Tree_(data_structure)">Tree (data structure)</a></p>
        <p><a href="/x">text with ] bracket and [ open</a></p>
        <p><img src="/i.png" alt="alt with ](http://evil.test) payload"></p>
        <p><a href="/y">![not an image]</a></p>
        <p>bare text with [brackets] and (parens) and *stars*.</p>
    </div>
</body>
</html>
"""

HOSTILE_INDIC_SCRIPTS = """
<html>
<body>
    <div class="content">
        <h1>ภาษาไทย हिन्दी</h1>
        <p>สวัสดีครับนี่คือข้อความทดสอบ (no spaces in Thai script).</p>
        <p>नमस्ते — क्षत्रिय conjuncts with <b>बोल्ड</b> inline.</p>
        <p><a href="/ไทย/page">ลิงก์ไทย</a></p>
    </div>
</body>
</html>
"""

# round-5 thirty-first wave: block-in-block composition the earlier
# waves never crossed (each probed live before freezing).  The modern
# card pattern — an <a> wrapping a whole div/heading/list — renders
# its BLOCK markdown inside the link text (`[### Card One\n\n...]
# (url)`): markdownify has no block-link special case and this engine
# pins the same bytes, images and bullet markers included.  Blocks
# inside table cells flatten through the cell seam: <pre> collapses
# to a single-line fenced span (internal newlines -> spaces, tabs
# kept), <hr> becomes an inline `---`, headings lose their markers,
# and sibling paragraphs join with the double-space seam; a <caption>
# carrying inline markup keeps its strong/link rendering above the
# table; a td-only thead still takes the header-delimiter row.  List
# composition: a <table> inside an <li> indents under the item and
# grows the padded empty header; a <dl> inside an <ol> item renders
# the `term / :   definition` shape at item indent; <ol start> is
# honored while <li value> and <ol type> are IGNORED (markdownify
# consults neither); a <ul> directly inside a <ul> (no li wrapper —
# the classic authoring error) steps the bullet cycle to `+` depth;
# and <details> children render in DOCUMENT order, so a late
# <summary> renders after the content that precedes it.

HOSTILE_BLOCK_LINK = """
<html>
<body>
    <div class="content">
        <h1>Block Link</h1>
        <a href="/card/one.html"><div class="card"><h3>Card One</h3>
        <p>teaser paragraph inside the card.</p>
        <img src="/img/c1.png" alt="card art"></div></a>
        <a href="/card/two.html"><h2>Bare Heading Card</h2></a>
        <a href="/all.html"><ul><li>first</li><li>second</li></ul></a>
    </div>
</body>
</html>
"""

HOSTILE_BLOCK_IN_CELL = """
<html>
<body>
    <div class="content">
        <h1>Block In Cell</h1>
        <table>
            <caption>A <strong>bold</strong> <a href="/cap.html">caption</a></caption>
            <thead><tr><td>td-in-thead</td><td>second</td></tr></thead>
            <tr><td><pre>code line one
\ttab-indented two</pre></td><td><hr>after rule</td></tr>
            <tr><td><h3>Heading In Cell</h3><p>para one</p><p>para two</p></td><td>plain</td></tr>
        </table>
    </div>
</body>
</html>
"""

HOSTILE_LIST_COMPOSE = """
<html>
<body>
    <div class="content">
        <h1>List Compose</h1>
        <ol type="a" start="3">
            <li value="7">item with a table:
                <table><tr><td>in-li cell</td><td>x</td></tr></table></li>
            <li><dl><dt>term</dt><dd>definition inside ol item</dd></dl></li>
        </ol>
        <ul><ul><li>ul directly in ul, no li wrapper</li></ul></ul>
        <details><p>content before summary</p><summary>Late Summary</summary></details>
    </div>
</body>
</html>
"""

# round-5 thirtieth wave: EOF truncation and tag-recovery litter — the
# shapes a crawler's torn fetches and hand-written HTML actually leave
# behind (every behavior below probed live before freezing).
# html.parser enters CDATA mode for script/style ONLY: an unclosed
# <script> swallows everything to EOF and the noise strip then removes
# it, so a page truncated inside a script loses its tail silently —
# the crawl-truncation hazard eof-rawtext pins (content before the
# script survives; nothing after renders).  CDATA mode ends at the
# next LITERAL close tag wherever it hides — a `</script>` spelled
# inside a JS string or comment reopens markup parsing (probed; the
# fixture's script body therefore never spells it).  <textarea> is NOT
# rawtext under html.parser, so an unclosed one swallows nothing: its
# text and even child <p> markup render normally.  A page ending
# mid-tag (`<a href="/trunc` at EOF, eof-midtag) is flushed by the
# parser as literal DATA — the raw `<a href=...` bytes SURVIVE into
# the markdown rather than vanishing.  A quoted attribute value closes at the NEXT quote
# wherever that is: `href="/broken.html class="x">` yields
# href='/broken.html class=' with x">… as attribute junk, and because
# that anchor never closes, the rest of the content div becomes the
# LINK TEXT (block boundaries and all) — one mismatched quote rewrites
# the whole page's shape, byte-pinned here.  Tag litter: `</>`,
# `</ >`, `</123>` are dropped silently (text around them flows on);
# end-tag attributes (`</p class="x">`) are ignored but the tag still
# closes; `<p/>` is a startendtag (an empty paragraph — adjacent text
# joins without a block break); a bare `<` before a non-letter (`1 <
# 2`, `<3`, `<$5`, `< span>`) is literal text, never a tag open.
# Attribute values spanning raw newlines keep them — a split href
# renders a multi-line link target.  A reopened <html><body> after
# </body> parses as an ordinary nested subtree and the content
# cascade's class stage is FIRST-match (probed: a much larger
# duplicate content div in the reopened shell still loses), so the
# duplicate shell's content is dropped, not merged.  Form-in-table
# litter ((tr-level <form>, hidden inputs) renders the cell text/
# buttons without phantom rows; <noembed> is an ordinary unknown
# element (fallback text renders); empty <a name>/<a id> anchor
# targets vanish cleanly while fragment links keep their #hrefs.

HOSTILE_EOF_RAWTEXT = """
<html>
<body>
    <div class="ads">TRUNCATED SPONSOR</div>
    <div class="content">
        <h1>EOF Rawtext</h1>
        <p>kept paragraph with <a href="/eof/kept.html">a kept link</a>
        and <img src="/img/eof.png" alt="kept alt">.</p>
        <textarea name="draft">unclosed textarea swallows nothing
<p>markup inside the unclosed textarea still renders</p>
        <h2>After Textarea</h2>
        <p>still visible before the script truncation point.</p>
        <script type="text/javascript">
        var page = {truncated: true}; // the fetch tore here —
        // no closing tag ever arrives, CDATA mode runs to EOF:
        <p>this paragraph is inside the unclosed script</p>
        <h2>So Is This Heading</h2>
        </div></body></html>"""

HOSTILE_EOF_ATTR = """
<html>
<body>
    <div class="ads">EOF SPONSOR</div>
    <div class="content">
        <h1>EOF Attr</h1>
        <p>before the broken tag everything is ordinary, with
        <img src="/img/attr.png" alt="attr alt"> intact.</p>
        <p><a href="/ok.html">good link</a> then the mismatched quote:
        <a href="/broken.html class="x">rest of the div becomes link text
        <h2>Even This Heading</h2>
        <p>and this paragraph, all inside one anchor</p>
        </div>
    <div class="tail">outside the content div</div>
</body>
</html>
"""

HOSTILE_EOF_MIDTAG = """
<html>
<body>
    <div class="content">
        <h1>EOF Midtag</h1>
        <p>ordinary text with <a href="/mid/ok.html">one kept link</a>
        and <img src="/img/mid.png" alt="mid alt">.</p>
        <h2>Before The Tear</h2>
        <p>the fetch tore mid-tag right here <a href="/trunc"""

HOSTILE_TAG_LITTER = """
<html>
<body>
    <div class="content">
        <h1>Tag Litter</h1>
        <p>empty close</> flows on</p>
        <p>spaced close</ > flows on</p>
        <p>numeric close</123> flows on</p>
        <p>attr close</p class="x"> lands after it</p>
        <p>self-closed para<p/>joins without a break</p>
        <p>math says 1 < 2 and a <3 heart and <$5 and generic< span>text</p>
        <p><a href="/multi
line.html" title="a
b">newline-split attribute link</a></p>
    </div>
</body>
<html class="reopened"><body class="second">
    <div class="content"><h2>Reopened Shell</h2>
        <p>this duplicate content div is far larger than the first one
        and would win a largest-div contest, but the class stage is
        first-match, so none of this renders at all.</p>
    </div>
</body></html>
"""

HOSTILE_FORM_TABLE = """
<html>
<body>
    <div class="content">
        <h1>Form Table</h1>
        <noembed>plugin fallback text renders</noembed>
        <table>
            <form action="/submit" method="post">
                <tr><td>cell one <input type="hidden" name="h" value="1"></td>
                    <td><button type="submit">Send</button></td></tr>
                <tr><td>cell two</td>
                    <td><input type="text" name="q" value="typed"></td></tr>
            </form>
        </table>
        <p><a name="sec1"></a>legacy anchor target paragraph</p>
        <h2><a id="sec2"></a>Heading With Empty Anchor</h2>
        <p>jump back via <a href="#sec1">a fragment link</a> and out via
        <a href="/form/out.html">a real link</a>.</p>
    </div>
</body>
</html>
"""

FIXTURE_CASES: Dict[str, str] = {
    "hostile-eof-rawtext": HOSTILE_EOF_RAWTEXT,
    "hostile-eof-attr": HOSTILE_EOF_ATTR,
    "hostile-eof-midtag": HOSTILE_EOF_MIDTAG,
    "hostile-block-link": HOSTILE_BLOCK_LINK,
    "hostile-block-in-cell": HOSTILE_BLOCK_IN_CELL,
    "hostile-list-compose": HOSTILE_LIST_COMPOSE,
    "hostile-code-lang": HOSTILE_CODE_LANG,
    "hostile-quote-blocks": HOSTILE_QUOTE_BLOCKS,
    "hostile-data-uri": HOSTILE_DATA_URI,
    "hostile-component-embeds": HOSTILE_COMPONENT_EMBEDS,
    "hostile-lazy-img": HOSTILE_LAZY_IMG,
    "hostile-doc-anchors": HOSTILE_DOC_ANCHORS,
    "hostile-autolinks": HOSTILE_AUTOLINKS,
    "hostile-link-titles": HOSTILE_LINK_TITLES,
    "hostile-body-metadata": HOSTILE_BODY_METADATA,
    "hostile-container-seams": HOSTILE_CONTAINER_SEAMS,
    "hostile-quote-table": HOSTILE_QUOTE_TABLE,
    "hostile-indic-scripts": HOSTILE_INDIC_SCRIPTS,
    "hostile-md-injection": HOSTILE_MD_INJECTION,
    "hostile-soft-404": HOSTILE_SOFT_404,
    "hostile-inline-litter": HOSTILE_INLINE_LITTER,
    "hostile-br-seams": HOSTILE_BR_SEAMS,
    "hostile-em-adjacency": HOSTILE_EM_ADJACENCY,
    "hostile-inline-wrap-block": HOSTILE_INLINE_WRAP_BLOCK,
    "hostile-value-sequence": HOSTILE_VALUE_SEQUENCE,
    "hostile-row-headers-dl": HOSTILE_ROW_HEADERS_DL,
    "hostile-fence-flatten": HOSTILE_FENCE_FLATTEN,
    "hostile-entity-collision": HOSTILE_ENTITY_COLLISION,
    "hostile-list-indent-attr": HOSTILE_LIST_INDENT_ATTR,
    "hostile-election-order": HOSTILE_ELECTION_ORDER,
    "hostile-self-exclude": HOSTILE_SELF_EXCLUDE,
    "hostile-exclude-all-interior": HOSTILE_EXCLUDE_ALL_INTERIOR,
    "hostile-img-only-title": HOSTILE_IMG_ONLY_TITLE,
    "hostile-heading-hash": HOSTILE_HEADING_HASH,
    "hostile-fence-bytes-widgets": HOSTILE_FENCE_BYTES_WIDGETS,
    "hostile-list-pre-linkblock": HOSTILE_LIST_PRE_LINKBLOCK,
    "hostile-rawtext-tails": HOSTILE_RAWTEXT_TAILS,
    "hostile-orphan-cells": HOSTILE_ORPHAN_CELLS,
    "hostile-content-in-cell": HOSTILE_CONTENT_IN_CELL,
    "hostile-nested-links": HOSTILE_NESTED_LINKS,
    "hostile-pre-newline-loose": HOSTILE_PRE_NEWLINE_LOOSE,
    "hostile-fence-comment-misnest": HOSTILE_FENCE_COMMENT_MISNEST,
    "hostile-blocks-in-pre": HOSTILE_BLOCKS_IN_PRE,
    "hostile-strike-fragments": HOSTILE_STRIKE_FRAGMENTS,
    "hostile-article-first": HOSTILE_ARTICLE_FIRST,
    "hostile-class-vs-article": HOSTILE_CLASS_VS_ARTICLE,
    "hostile-id-vs-article": HOSTILE_ID_VS_ARTICLE,
    "hostile-qa-macro": HOSTILE_QA_MACRO,
    "hostile-entity-fence-cr": HOSTILE_ENTITY_FENCE_CR,
    "hostile-title-edges": HOSTILE_TITLE_EDGES,
    "hostile-formula-colgroup": HOSTILE_FORMULA_COLGROUP,
    "hostile-header-boundary": HOSTILE_HEADER_BOUNDARY,
    "hostile-ordinal-caption": HOSTILE_ORDINAL_CAPTION,
    "hostile-code-span-algebra": HOSTILE_CODE_SPAN_ALGEBRA,
    "hostile-code-interior": HOSTILE_CODE_INTERIOR,
    "hostile-heading-interior": HOSTILE_HEADING_INTERIOR,
    "hostile-cell-asymmetry": HOSTILE_CELL_ASYMMETRY,
    "hostile-dd-interior": HOSTILE_DD_INTERIOR,
    "hostile-linktext-interior": HOSTILE_LINKTEXT_INTERIOR,
    "hostile-ordered-continuation": HOSTILE_ORDERED_CONTINUATION,
    "hostile-marker-width": HOSTILE_MARKER_WIDTH,
    "hostile-orphan-structural": HOSTILE_ORPHAN_STRUCTURAL,
    "hostile-phantom-columns": HOSTILE_PHANTOM_COLUMNS,
    "hostile-quote-preservation": HOSTILE_QUOTE_PRESERVATION,
    "hostile-empty-rows": HOSTILE_EMPTY_ROWS,
    "hostile-br-containers": HOSTILE_BR_CONTAINERS,
    "hostile-noncandidate-class": HOSTILE_NONCANDIDATE_CLASS,
    "hostile-class-on-td": HOSTILE_CLASS_ON_TD,
    "hostile-tag-litter": HOSTILE_TAG_LITTER,
    "hostile-form-table": HOSTILE_FORM_TABLE,
    "hostile-render-empty": HOSTILE_RENDER_EMPTY,
    "degenerate-empty": DEGENERATE_EMPTY,
    "degenerate-whitespace": DEGENERATE_WHITESPACE,
    "degenerate-comment-only": DEGENERATE_COMMENT_ONLY,
    "degenerate-doctype-only": DEGENERATE_DOCTYPE_ONLY,
    "hostile-semantic-page": HOSTILE_SEMANTIC_PAGE,
    "hostile-semantic-divless": HOSTILE_SEMANTIC_DIVLESS,
    "hostile-object-fallback": HOSTILE_OBJECT_FALLBACK,
    "hostile-comment-edge": HOSTILE_COMMENT_EDGE,
    "hostile-inline-empty": HOSTILE_INLINE_EMPTY,
    "hostile-url-soup": HOSTILE_URL_SOUP,
    "hostile-img-edge": HOSTILE_IMG_EDGE,
    "hostile-title-edge": HOSTILE_TITLE_EDGE,
    "hostile-block-compose": HOSTILE_BLOCK_COMPOSE,
    "hostile-cascade-ambiguity": HOSTILE_CASCADE_AMBIGUITY,
    "hostile-cascade-siblings": HOSTILE_CASCADE_SIBLINGS,
    "hostile-frameset": HOSTILE_FRAMESET,
    "hostile-cond-comments": HOSTILE_COND_COMMENTS,
    "hostile-bom-plaintext": HOSTILE_BOM_PLAINTEXT,
    "hostile-case-tags": HOSTILE_CASE_TAGS,
    "hostile-rawtext-markup": HOSTILE_RAWTEXT_MARKUP,
    "hostile-doctype-meta": HOSTILE_DOCTYPE_META,
    "hostile-md-metachars": HOSTILE_MD_METACHARS,
    "hostile-table-pipes": HOSTILE_TABLE_PIPES,
    "hostile-bidi-shaping": HOSTILE_BIDI_SHAPING,
    "hostile-table-recovery": HOSTILE_TABLE_RECOVERY,
    "hostile-select-form": HOSTILE_SELECT_FORM,
    "hostile-attr-edge": HOSTILE_ATTR_EDGE,
    "hostile-ctrl-chars": HOSTILE_CTRL_CHARS,
    "hostile-legacy-tail": HOSTILE_LEGACY_TAIL,
    "hostile-table-sections": HOSTILE_TABLE_SECTIONS,
    "hostile-inline-oddities": HOSTILE_INLINE_ODDITIES,
    "hostile-template-slot": HOSTILE_TEMPLATE_SLOT,
    "hostile-integration-points": HOSTILE_INTEGRATION_POINTS,
    "hostile-legacy-remnants": HOSTILE_LEGACY_REMNANTS,
    "hostile-srcdoc-iframe": HOSTILE_SRCDOC_IFRAME,
    "hostile-xml-prolog": HOSTILE_XML_PROLOG,
    "hostile-head-content": HOSTILE_HEAD_CONTENT,
    "stress-10k": STRESS_10K,
    "hostile-inline-tail": HOSTILE_INLINE_TAIL,
    "hostile-table-span": HOSTILE_TABLE_SPAN,
    "hostile-list-edge": HOSTILE_LIST_EDGE,
    "hostile-media-elements": HOSTILE_MEDIA_ELEMENTS,
    "realistic-blog": REALISTIC_BLOG,
    "realistic-docs": REALISTIC_DOCS,
    "hostile-ws-unicode": HOSTILE_WS_UNICODE,
    "hostile-link-edge": HOSTILE_LINK_EDGE,
    "hostile-heading-edge": HOSTILE_HEADING_EDGE,
    "article-basic": ARTICLE_BASIC,
    "hostile-attr-soup": HOSTILE_ATTR_SOUP,
    "hostile-cdata-body": HOSTILE_CDATA_BODY,
    "hostile-deep-tables": HOSTILE_DEEP_TABLES,
    "hostile-entity-runs": HOSTILE_ENTITY_RUNS,
    "hostile-forms": HOSTILE_FORMS,
    "hostile-media-links": HOSTILE_MEDIA_LINKS,
    "hostile-br-hr": HOSTILE_BR_HR,
    "hostile-iframe-noscript": HOSTILE_IFRAME_NOSCRIPT,
    "hostile-pre-code": HOSTILE_PRE_CODE,
    "hostile-quote-dl": HOSTILE_QUOTE_DL,
    "hostile-foreign": HOSTILE_FOREIGN,
    "hostile-pi-bogus": HOSTILE_PI_BOGUS,
    "hostile-comments": HOSTILE_COMMENTS,
    "hostile-script-cdata": HOSTILE_SCRIPT_CDATA,
    "hostile-misnest": HOSTILE_MISNEST,
    "hostile-implicit-close": HOSTILE_IMPLICIT_CLOSE,
    "hostile-entities": HOSTILE_ENTITIES,
    "hostile-tagsoup": HOSTILE_TAGSOUP,
    "div-content-images": DIV_CONTENT_IMAGES,
    "empty-lines": EMPTY_LINES,
    "links-basic": LINKS_BASIC,
    "links-excluded": LINKS_EXCLUDED,
    "links-mixed": LINKS_MIXED,
    "links-none": LINKS_NONE,
    "id-container": ID_CONTAINER,
    "largest-div": LARGEST_DIV,
    "title-fallback-title": TITLE_FALLBACK_TITLE,
    "title-fallback-none": TITLE_FALLBACK_NONE,
    "quirks": QUIRKS,
    "custom-container": CUSTOM_CONTAINER,
    "hostile-ruby-anno": HOSTILE_RUBY_ANNO,
    "hostile-map-area": HOSTILE_MAP_AREA,
    "hostile-base-href": HOSTILE_BASE_HREF,
    "hostile-custom-elements": HOSTILE_CUSTOM_ELEMENTS,
    "hostile-newline-soup": HOSTILE_NEWLINE_SOUP,
    "hostile-inline-semantics": HOSTILE_INLINE_SEMANTICS,
    "realistic-news": REALISTIC_NEWS,
    "realistic-product": REALISTIC_PRODUCT,
    "realistic-wiki": REALISTIC_WIKI,
    "hostile-annotation-layer": HOSTILE_ANNOTATION_LAYER,
    "hostile-invisible-chars": HOSTILE_INVISIBLE_CHARS,
    "realistic-consent-overlay": REALISTIC_CONSENT_OVERLAY,
    "hostile-charref-nosemi": HOSTILE_CHARREF_NOSEMI,
    "realistic-newsletter": REALISTIC_NEWSLETTER,
    "realistic-forum-thread": REALISTIC_FORUM_THREAD,
    "realistic-zh-article": REALISTIC_ZH_ARTICLE,
    "realistic-ar-rtl": REALISTIC_AR_RTL,
    "hostile-charref-planes": HOSTILE_CHARREF_PLANES,
    "stress-deep-750": STRESS_DEEP_750,
    "stress-deep-overflow": STRESS_DEEP_OVERFLOW,
}

# option variants (FIXTURES.md §1.2)
VARIANTS: Dict[str, dict] = {
    "default": {},
    "no_images": {"no_images": True},
    "no_links": {"no_links": True},
    "root_url": {"root_url": "https://fixtures.test/docs"},
    "exclude": {"exclude_selectors": (".ads", "#nav")},
    "hs_all": {"extra_heading_space": "all"},
    "hs_2": {"extra_heading_space": "2"},
    "hs_23": {"extra_heading_space": "2,3"},
    "hs_invalid": {"extra_heading_space": "2,x"},
    "source": {"prepend_source_link": True},
    "custom": {"content": ("custom-name",)},
}


def variant_config(variant: str) -> ExtractConfig:
    return ExtractConfig(**VARIANTS[variant])


def fixture_url(case_id: str) -> str:
    return f"https://fixtures.test/{case_id}"


REFERENCE_TS = datetime.datetime(2025, 6, 14, 0, 0, 0)
LANG_CYCLE = ("en", "es", "zh", "de")


def fixture_pages() -> List[Tuple[str, datetime.datetime, bytes, str, str]]:
    """One pages-row per fixture case: (url, warc_ts, html, text, lang)."""
    rows = []
    for i, (case_id, html) in enumerate(sorted(FIXTURE_CASES.items())):
        rows.append((
            fixture_url(case_id),
            REFERENCE_TS + datetime.timedelta(seconds=i),
            html.encode("utf-8"),
            None,
            LANG_CYCLE[i % 4],
        ))
    return rows


# ---------------------------------------------------------------------------
# synthetic entities / relations (shared ground truth for the KG stage)
# ---------------------------------------------------------------------------

_ORG_A = ("Quantum", "Stellar", "Crimson", "Golden", "Silver", "Northern",
          "Pacific", "Atlas", "Vertex", "Nimbus")
_ORG_B = ("Dynamics", "Systems", "Holdings", "Labs", "Industries",
          "Networks", "Analytics", "Robotics", "Energy", "Logistics")
_FIRST = ("Alice", "Bruno", "Carla", "Diego", "Elena", "Farid", "Grace",
          "Hiro", "Ingrid", "Jonas")
_LAST = ("Almeida", "Baranov", "Chen", "Dubois", "Eriksen", "Fontana",
         "Garcia", "Haddad", "Ivanova", "Johansson")
_CITY = ("Amsterdam", "Bogota", "Cairo", "Dublin", "Esbjerg", "Fukuoka",
         "Geneva", "Hanoi", "Istanbul", "Jakarta")

N_ORGS = 100
N_PEOPLE = 100


def org_name(k: int) -> str:
    return f"{_ORG_A[k % 10]} {_ORG_B[(k // 10) % 10]} {k}"


def person_name(k: int) -> str:
    return f"{_FIRST[k % 10]} {_LAST[(k // 10) % 10]}"


def city_name(k: int) -> str:
    return _CITY[k % 10]


def alias_rows() -> List[Tuple[str, int, str, str, float]]:
    """alias_dict: (alias, entity_id, canonical, etype, prior).

    Entity ids: orgs 1..100, people 101..200.  Each entity has its
    canonical name plus deterministic variants; ~10 hub aliases are
    shared across many entities to exercise skew/salting
    (FIXTURES.md §2).
    """
    rows: List[Tuple[str, int, str, str, float]] = []
    for k in range(N_ORGS):
        eid = k + 1
        canon = org_name(k)
        rows.append((canon, eid, canon, "ORG", 1.0))
        rows.append((canon.upper(), eid, canon, "ORG", 0.5))
        head = " ".join(canon.split()[:2])         # drop numeric suffix
        rows.append((head, eid, canon, "ORG", 1.0 / (2 + k)))  # shared hub alias
    for k in range(N_PEOPLE):
        eid = N_ORGS + k + 1
        canon = person_name(k)
        rows.append((canon, eid, canon, "PERSON", 1.0))
        first = canon.split()[0]
        rows.append((first, eid, canon, "PERSON", 1.0 / (2 + k)))  # hub alias
    return rows


_REL_TEMPLATES = (
    ("{p} works for {o}.", "works_for"),
    ("{p} founded {o}.", "founded"),
    ("{p} is the CEO of {o}.", "ceo_of"),
    ("{o} acquired {o2}.", "acquired"),
    ("{o} is based in {c}.", "based_in"),
)

_FILLER = (
    "The quarterly report was released on schedule.",
    "Markets reacted with cautious optimism.",
    "Analysts expect steady growth next year.",
    "The announcement drew wide attention.",
    "Several projects remain under review.",
)


def _zipf_host(rng: random.Random, n_hosts: int = 100, s: float = 1.2) -> int:
    """Zipf(s) over hosts -> hub-domain skew (FIXTURES.md §1)."""
    weights = [1.0 / ((k + 1) ** s) for k in range(n_hosts)]
    total = sum(weights)
    x = rng.random() * total
    acc = 0.0
    for k, w in enumerate(weights):
        acc += w
        if x <= acc:
            return k
    return n_hosts - 1


def bulk_page_html(i: int, rng: random.Random) -> Tuple[str, List[Tuple[str, str, str]]]:
    """One synthetic article + the relation sentences planted in it.

    Returns (html, [(subj_canonical, pred, obj_canonical), ...]).
    """
    p_idx = rng.randrange(N_PEOPLE)
    o_idx = rng.randrange(N_ORGS)
    o2_idx = (o_idx + 1 + rng.randrange(N_ORGS - 1)) % N_ORGS
    c_idx = rng.randrange(10)
    person, org, org2, city = (person_name(p_idx), org_name(o_idx),
                               org_name(o2_idx), city_name(c_idx))

    planted: List[Tuple[str, str, str]] = []
    sentences: List[str] = []
    n_rel = 1 + rng.randrange(3)
    for _ in range(n_rel):
        tmpl, pred = _REL_TEMPLATES[rng.randrange(len(_REL_TEMPLATES))]
        sent = tmpl.format(p=person, o=org, o2=org2, c=city)
        if pred in ("works_for", "founded", "ceo_of"):
            planted.append((person, pred, org))
        elif pred == "acquired":
            planted.append((org, pred, org2))
        else:
            planted.append((org, pred, city))
        sentences.append(sent)
    for _ in range(2 + rng.randrange(3)):
        sentences.append(_FILLER[rng.randrange(len(_FILLER))])
    rng.shuffle(sentences)

    paras = "\n        ".join(f"<p>{s}</p>" for s in sentences)
    html = f"""
<html>
<head><title>Report {i}</title></head>
<body>
    <nav id="nav"><a href="/home">Home</a></nav>
    <div class="ads">advertisement {i}</div>
    <div class="content">
        <h1>Report {i}: {org}</h1>
        {paras}
        <h2>Notes</h2>
        <p>Compiled automatically for record {i}.</p>
    </div>
</body>
</html>
"""
    return html, planted


def bulk_page_row(i: int, seed: int = 42, with_truth: bool = False) -> tuple:
    """One synthetic pages row; RNG is seeded per page id so generation
    is identical regardless of partitioning or generation order."""
    rng = random.Random(f"{seed}:{i}")  # str seed: stable across processes
    h = _zipf_host(rng)
    url = f"https://host{h:03d}.test/page{i:05d}"
    html, planted = bulk_page_html(i, rng)
    row = (url, REFERENCE_TS + datetime.timedelta(seconds=i),
           html.encode("utf-8"), None, LANG_CYCLE[i % 4])
    return row + ((planted,) if with_truth else ())


def bulk_pages(n: int, seed: int = 42,
               with_truth: bool = False) -> Iterator[tuple]:
    """n synthetic pages rows; hosts Zipf-skewed over 100 domains.

    Yields (url, warc_ts, html_bytes, text, lang) or, with truth,
    (+ planted triples) for the oracle P/R harness.
    """
    for i in range(n):
        yield bulk_page_row(i, seed, with_truth)


# ---------------------------------------------------------------------------
# url-file fixture (A2 source input)
# ---------------------------------------------------------------------------

def url_file_fixture(sf_dir: str) -> str:
    """Materialize the A2 url-file input for a testdata dir — one url
    per documents row in doc_id order, a blank line after every row
    with i % 7 == 3 (blank lines must be dropped by the source).

    Fixture-layer synthesis: read the parquet with pyarrow on the
    driver (no Spark job, no collect inside a registered query), write
    once to a content-addressed temp path, atomic rename so concurrent
    verifiers share one file.
    """
    import hashlib
    import os
    import tempfile

    import pyarrow.parquet as pq

    key = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    path = os.path.join(tempfile.gettempdir(), f"mdscraper_urls_{key}.txt")
    if os.path.exists(path):
        return path
    ids = sorted(pq.read_table(f"{sf_dir}/documents.parquet",
                               columns=["doc_id"])["doc_id"].to_pylist())
    tmp = f"{path}.{os.getpid()}.tmp"
    with open(tmp, "w") as fh:
        for i, doc_id in enumerate(ids):
            fh.write(f"https://docs.test/{doc_id}\n")
            if i % 7 == 3:
                fh.write("\n")
    os.replace(tmp, path)
    return path
