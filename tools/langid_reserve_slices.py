"""SEALED blind-slice reserve for the langid freeze discipline
(round 13, VERDICT r12 ask #4).

Problem this solves: the freeze machinery consumes eval corpora — every
time a frozen slice's numbers are consulted to accept/reject a model
change it is demoted to a dev set, and the round-12 blind slice
(HOLDOUT_FRESH23) has already been measured once. This module is a
REUSABLE RESERVE: two fresh slices authored in round 13 (after the
round-12 vocabulary, before any round-13 model change was evaluated),
each measured AT MOST ONCE, in a future round, as that round's blind
generalization figure.

THE STANDING PROTOCOL (the "when is a slice demoted" rule):

1. A slice is SEALED until its first evaluation. Sealed means: never
   scored against any candidate or shipped model, by tool or by hand.
   The content-hash pins in tests/test_langid_holdout.py prevent
   silent edits; this docstring's STATUS registry records state.
2. A slice may be OPENED (scored once, numbers recorded in BASELINE.md
   and the STATUS line updated to ``opened-r<N>``) only when the round
   ships a model change (weights, buckets, vocabulary, classes) and
   needs a blind figure. One slice per round, at most.
3. The moment a slice's numbers influence ANY subsequent decision
   (hyperparameter choice, vocab repair, accept gate), its STATUS
   becomes ``dev`` and its figures must be relabeled "tuned dev set"
   wherever quoted. An opened-but-unconsulted slice stays quotable as
   the blind figure for the round it was opened in.
4. When fewer than two sealed slices remain, the NEXT round must
   author replacements BEFORE evaluating any model change (this file's
   round-13 pattern: author first, experiment second).

STATUS registry (append, never rewrite):
  RESERVE_A: opened-r13 — 0.9737 on 190 sentences, scored ONCE against
             the shipped round-13 model (16384 buckets + da/sv/nl
             vocabulary broadening) after it was final; confusions
             cs->hr 2, de->sv 1, fr->ro 1, uk->ru 1 (all within-family;
             no Nordic miss). Figure recorded in BASELINE.md round-13
             langid section. Not consulted for any decision as of this
             writing — quotable as the round-13 blind figure.
  RESERVE_B: opened-r14 — 190/190 = 1.0000, scored ONCE against the
             shipped round-14 model (length-standardized training +
             uk/ru/bg + Romance/Germanic/Slavic contrastive vocabulary
             blocks) after it was final; zero confusions. Figure
             recorded in BASELINE.md round-14 langid section. Not
             consulted for any decision as of this writing — quotable
             as the round-14 blind figure.
  RESERVE_C: SEALED (authored round 13, AFTER A was opened and BEFORE
             the sibling-language expansion was evaluated — rule 4;
             covers the prospective 42-language set, so it can serve
             as the blind figure for whichever round ships the
             no/sk/ms/sr siblings)
  RESERVE_D: SEALED (authored round 14 BEFORE any round-14 model
             change was evaluated — rule 4, since the round plans to
             open B for the uk/ru + Romance retrain and C if the da/no
             pilot ships; 42 languages incl. the sibling candidates;
             domains post & letters / sleep & dreams)

Authorship provenance: all sentences below were written in round 13 by
the builder (network-blocked environment — same external-validity
caveat as every langid eval corpus in this repo: same-register
generalization, not web-corpus performance). Domains are disjoint from
both the frozen holdout (weather, food, sports, technology, health,
family, work, travel, music, science) and HOLDOUT_FRESH23 (law,
agriculture, construction, space, celebrations): slice A is markets &
trade + animals & wildlife; slice B is emotions & friendship + craft &
repair. 5 sentences per language per slice, all 38 languages.

Usage (OPENS a slice — read the protocol first):
    python tools/langid_reserve_slices.py A
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- slice A: markets & trade / animals & wildlife --------------------

RESERVE_A: dict[str, list[str]] = {
    "en": [
        "The fish stall at the corner sells out before noon on Saturdays.",
        "She bargained for ten minutes and paid half the asking price.",
        "Imported goods became more expensive after the currency weakened.",
        "A family of foxes has settled under the old barn this spring.",
        "The storks return to the same rooftop nest every single year.",
    ],
    "de": [
        "Der Wochenmarkt auf dem Platz beginnt schon um sechs Uhr morgens.",
        "Die Händlerin wickelte den Käse sorgfältig in Papier ein.",
        "Wegen der gestiegenen Preise kaufen viele Leute weniger Fleisch.",
        "Im Wald hinter dem Dorf wurden wieder Wildschweine gesehen.",
        "Die Schwalben bauen ihr Nest jedes Jahr unter unserem Dach.",
    ],
    "fr": [
        "Le marché aux poissons ouvre très tôt près du vieux port.",
        "Elle a marchandé le prix du tapis pendant un quart d'heure.",
        "Les commerçants ferment boutique plus tôt pendant l'hiver.",
        "Un renard traverse souvent le jardin à la tombée de la nuit.",
        "Les cigognes reviennent chaque printemps sur le même clocher.",
    ],
    "es": [
        "El puesto de frutas de la esquina abre antes del amanecer.",
        "Regateó un buen rato y consiguió el cesto por la mitad.",
        "Los precios del aceite subieron mucho este invierno.",
        "Una manada de lobos volvió a instalarse en la sierra.",
        "Las golondrinas anidan cada año bajo el tejado de la abuela.",
    ],
    "pt": [
        "A feira da nossa rua enche de gente logo de manhãzinha.",
        "Ela pechinchou o preço do peixe até conseguir um bom desconto.",
        "Os comerciantes reclamam da subida do aluguel das lojas.",
        "Um bando de araras costuma pousar nas árvores da praça.",
        "As andorinhas voltam todos os anos para o beiral da casa.",
    ],
    "it": [
        "Il mercato del pesce apre all'alba vicino al molo vecchio.",
        "Ha contrattato a lungo e alla fine ha pagato la metà.",
        "I negozianti del centro lamentano l'aumento degli affitti.",
        "Un cinghiale ha attraversato la strada davanti al casale.",
        "Le rondini tornano ogni anno sotto la gronda del fienile.",
    ],
    "nl": [
        "De kaasboer op de markt snijdt altijd een stukje om te proeven.",
        "Ze heeft lang afgedongen en kreeg de mand voor de helft.",
        "Door de dure huur verdwijnen steeds meer winkeltjes uit de straat.",
        "Er zit al weken een egel onder de heg in onze achtertuin.",
        "De ooievaars keren elk voorjaar terug naar hetzelfde nest.",
    ],
    "sv": [
        "Fiskståndet vid torget brukar vara slutsålt före lunch.",
        "Hon prutade envist och fick korgen för halva priset.",
        "Många små butiker har stängt sedan hyrorna höjdes.",
        "En älg med kalv gick över vägen strax före gryningen.",
        "Tranorna rastar vid sjön varje vår på väg norrut.",
    ],
    "da": [
        "Fiskehandleren på torvet sælger ud længe før middag.",
        "Hun prutfede om prisen og fik kurven til det halve.",
        "Flere små butikker er lukket efter huslejen steg.",
        "Et rådyr stod stille ved skovbrynet i morgensolen.",
        "Svalerne vender hvert forår tilbage til stalden.",
    ],
    "cs": [
        "Trh na náměstí začíná už za svítání a končí v poledne.",
        "Dlouho smlouvala a nakonec koupila košík za polovinu.",
        "Kvůli vysokým nájmům zavírají v ulici další krámky.",
        "U lesa za vesnicí se znovu objevila liška s mláďaty.",
        "Vlaštovky se každé jaro vracejí do hnízda pod okapem.",
    ],
    "pl": [
        "Targ na rynku zaczyna się o świcie i trwa do południa.",
        "Targowała się długo i kupiła koszyk za połowę ceny.",
        "Przez wysokie czynsze znikają kolejne małe sklepiki.",
        "Przy drodze do lasu widziano rano sarnę z młodym.",
        "Bociany co roku wracają na gniazdo przy stodole.",
    ],
    "ru": [
        "Рыбные ряды на рынке пустеют задолго до полудня.",
        "Она долго торговалась и купила корзину за полцены.",
        "Из-за высокой аренды в переулке закрылись лавки.",
        "У опушки леса снова видели лисицу с лисятами.",
        "Ласточки каждую весну возвращаются под нашу крышу.",
    ],
    "uk": [
        "Рибні ряди на базарі порожніють ще до обіду.",
        "Вона довго торгувалася і купила кошик за півціни.",
        "Через високу оренду в провулку зачинилися крамниці.",
        "Біля узлісся знову бачили лисицю з малими.",
        "Ластівки щовесни повертаються під нашу стріху.",
    ],
    "bg": [
        "Рибният пазар край пристанището отваря още по тъмно.",
        "Тя дълго се пазари и купи кошницата на половин цена.",
        "Заради скъпите наеми затварят още малки магазинчета.",
        "Край селото отново са видели сърна с малкото ѝ.",
        "Лястовиците всяка пролет се връщат под стряхата.",
    ],
    "hr": [
        "Ribarnica kraj luke rasproda se davno prije podneva.",
        "Dugo se cjenkala i platila košaru upola manje.",
        "Zbog skupih najamnina zatvaraju se male trgovine.",
        "Kraj šume su opet vidjeli srnu s mladunčetom.",
        "Lastavice se svakog proljeća vraćaju pod strehu.",
    ],
    "ro": [
        "Piața de pește de lângă port se golește înainte de prânz.",
        "S-a tocmit îndelung și a plătit coșul la jumătate de preț.",
        "Din cauza chiriilor mari se închid tot mai multe prăvălii.",
        "La marginea pădurii a fost văzută din nou o căprioară.",
        "Rândunelele se întorc în fiecare primăvară sub streașină.",
    ],
    "hu": [
        "A halas stand a piacon délre mindig teljesen kiürül.",
        "Sokáig alkudozott, végül fél áron vitte el a kosarat.",
        "A magas bérleti díjak miatt sorra zárnak be a kis boltok.",
        "Az erdő szélén megint őzet láttak a hajnali ködben.",
        "A fecskék minden tavasszal visszatérnek az eresz alá.",
    ],
    "fi": [
        "Kalatiskin tuotteet loppuvat torilta jo ennen puoltapäivää.",
        "Hän tinki pitkään ja sai korin puoleen hintaan.",
        "Korkeiden vuokrien takia pienet puodit sulkevat ovensa.",
        "Metsän reunassa nähtiin aamulla hirvi vasoineen.",
        "Pääskyset palaavat joka kevät saman ladon räystäälle.",
    ],
    "tr": [
        "Balık tezgahı pazarda öğlen olmadan boşalıyor.",
        "Uzun uzun pazarlık etti ve sepeti yarı fiyata aldı.",
        "Yüksek kiralar yüzünden sokaktaki küçük dükkanlar kapanıyor.",
        "Köyün kıyısındaki ormanda yine bir tilki görüldü.",
        "Leylekler her bahar aynı bacanın üstüne yuva kurar.",
    ],
    "id": [
        "Lapak ikan di pasar selalu habis sebelum tengah hari.",
        "Dia menawar cukup lama dan membayar separuh harga.",
        "Sewa kios yang mahal membuat banyak pedagang kecil tutup.",
        "Sekawanan monyet sering turun ke kebun di tepi hutan.",
        "Burung layang-layang kembali ke sarangnya setiap musim.",
    ],
    "vi": [
        "Sạp cá ở chợ thường hết hàng trước giữa trưa.",
        "Bà mặc cả một hồi lâu và mua được rổ cá nửa giá.",
        "Tiền thuê sạp tăng khiến nhiều người bán nhỏ phải nghỉ.",
        "Một đàn khỉ hay xuống vườn ở bìa rừng kiếm ăn.",
        "Chim én năm nào cũng bay về làm tổ dưới mái hiên.",
    ],
    "sw": [
        "Soko la samaki ufukweni huisha bidhaa kabla ya adhuhuri.",
        "Alilumbana bei kwa muda mrefu akanunua kikapu kwa nusu bei.",
        "Kodi kubwa za maduka zinawafanya wachuuzi wadogo kufunga.",
        "Kundi la tembo lilipita karibu na kijiji usiku wa jana.",
        "Ndege wa mwituni hurudi kwenye viota vyao kila mwaka.",
    ],
    "el": [
        "Ο πάγκος με τα ψάρια αδειάζει πριν από το μεσημέρι.",
        "Παζάρεψε αρκετή ώρα και πήρε το καλάθι στη μισή τιμή.",
        "Τα ακριβά ενοίκια κλείνουν τα μικρά μαγαζιά της γειτονιάς.",
        "Στην άκρη του δάσους είδαν πάλι μια αλεπού με τα μικρά της.",
        "Τα χελιδόνια γυρίζουν κάθε άνοιξη στην ίδια φωλιά.",
    ],
    "ar": [
        "ينفد السمك من سوق الميناء قبل منتصف النهار.",
        "ساومت البائع طويلا حتى اشترت السلة بنصف الثمن.",
        "أغلقت محال صغيرة كثيرة بسبب ارتفاع الإيجارات.",
        "شوهد ثعلب مع صغاره عند أطراف الغابة صباح أمس.",
        "تعود طيور السنونو كل ربيع إلى أعشاشها تحت السقف.",
    ],
    "fa": [
        "بساط ماهی در بازار پیش از ظهر خالی می‌شود.",
        "او مدتی چانه زد و سبد را به نصف قیمت خرید.",
        "اجاره‌های سنگین مغازه‌های کوچک محله را می‌بندد.",
        "کنار جنگل دوباره روباهی با بچه‌هایش دیده شد.",
        "پرستوها هر بهار به لانه زیر شیروانی برمی‌گردند.",
    ],
    "ur": [
        "بندرگاہ کے بازار میں مچھلی دوپہر سے پہلے ختم ہو جاتی ہے۔",
        "اس نے دیر تک بھاؤ تاؤ کیا اور ٹوکری آدھی قیمت پر خریدی۔",
        "مہنگے کرائے کی وجہ سے گلی کی چھوٹی دکانیں بند ہو رہی ہیں۔",
        "جنگل کے کنارے پھر ایک لومڑی اپنے بچوں کے ساتھ دکھائی دی۔",
        "ابابیلیں ہر بہار میں چھت کے نیچے اپنے گھونسلوں کو لوٹ آتی ہیں۔",
    ],
    "he": [
        "דוכן הדגים בשוק מתרוקן הרבה לפני הצהריים.",
        "היא התמקחה שעה ארוכה וקנתה את הסל בחצי מחיר.",
        "שכר הדירה הגבוה סוגר את החנויות הקטנות ברחוב.",
        "בשולי היער נראתה שוב שועלה עם גוריה.",
        "הסנוניות חוזרות בכל אביב אל הקן שמתחת לגג.",
    ],
    "hi": [
        "बंदरगाह के बाज़ार में मछली दोपहर से पहले ही बिक जाती है।",
        "उसने देर तक मोलभाव किया और टोकरी आधे दाम में खरीदी।",
        "महंगे किराये के कारण गली की छोटी दुकानें बंद हो रही हैं।",
        "जंगल के किनारे फिर एक लोमड़ी अपने बच्चों के साथ दिखी।",
        "अबाबील हर बसंत में छत के नीचे अपने घोंसले में लौट आती हैं।",
    ],
    "bn": [
        "বন্দরের বাজারে মাছ দুপুরের আগেই ফুরিয়ে যায়।",
        "সে অনেকক্ষণ দরদাম করে ঝুড়িটা অর্ধেক দামে কিনল।",
        "চড়া ভাড়ার কারণে গলির ছোট দোকানগুলো বন্ধ হয়ে যাচ্ছে।",
        "বনের ধারে আবার এক শেয়ালকে ছানাসহ দেখা গেছে।",
        "প্রতি বসন্তে চড়ুইরা চালের নিচের বাসায় ফিরে আসে।",
    ],
    "ta": [
        "துறைமுகச் சந்தையில் மீன் மதியத்துக்கு முன்பே தீர்ந்துவிடும்.",
        "அவள் நீண்ட நேரம் பேரம் பேசி கூடையை பாதி விலைக்கு வாங்கினாள்.",
        "அதிக வாடகையால் தெருவின் சிறு கடைகள் மூடப்படுகின்றன.",
        "காட்டின் ஓரத்தில் மீண்டும் ஒரு நரி குட்டிகளுடன் காணப்பட்டது.",
        "தூக்கணாங்குருவிகள் ஒவ்வொரு வசந்தத்திலும் கூட்டுக்குத் திரும்புகின்றன.",
    ],
    "te": [
        "రేవు బజారులో చేపలు మధ్యాహ్నానికి ముందే అయిపోతాయి.",
        "ఆమె చాలా సేపు బేరమాడి బుట్టను సగం ధరకు కొన్నది.",
        "అధిక అద్దెల వల్ల వీధిలోని చిన్న దుకాణాలు మూతపడుతున్నాయి.",
        "అడవి అంచున మళ్ళీ ఒక నక్క పిల్లలతో కనిపించింది.",
        "పిచ్చుకలు ప్రతి వసంతంలో ఇంటి చూరు కింది గూటికి తిరిగొస్తాయి.",
    ],
    "th": [
        "แผงปลาที่ตลาดท่าเรือมักขายหมดก่อนเที่ยงวัน",
        "เธอต่อราคาอยู่นานจนได้ตะกร้าในราคาครึ่งเดียว",
        "ค่าเช่าที่แพงทำให้ร้านเล็กในซอยทยอยปิดตัว",
        "ชาวบ้านเห็นหมาจิ้งจอกกับลูกของมันที่ชายป่าอีกครั้ง",
        "นกนางแอ่นบินกลับมาทำรังใต้ชายคาทุกฤดูใบไม้ผลิ",
    ],
    "ko": [
        "항구 시장의 생선 좌판은 정오가 되기 전에 다 팔린다.",
        "그녀는 한참을 흥정해서 바구니를 반값에 샀다.",
        "비싼 임대료 때문에 골목의 작은 가게들이 문을 닫는다.",
        "숲 가장자리에서 새끼를 데린 여우가 다시 목격되었다.",
        "제비들은 봄마다 처마 밑 둥지로 돌아온다.",
    ],
    "ja": [
        "港の市場の魚は昼前にはすっかり売り切れてしまう。",
        "彼女は長いこと値切って籠を半額で手に入れた。",
        "家賃の高騰で路地の小さな店が次々と閉まっていく。",
        "森のはずれで子連れの狐がまた目撃された。",
        "燕は毎年春になると軒下の巣に帰ってくる。",
    ],
    "zh": [
        "码头市场的鱼摊不到中午就卖光了。",
        "她讨价还价了半天以半价买下了那只篮子。",
        "高昂的租金让巷子里的小店一家家关门。",
        "村边的树林里又有人看见带着幼崽的狐狸。",
        "燕子每年春天都会回到屋檐下的旧巢。",
    ],
    "ka": [
        "ნავსადგურის ბაზარში თევზი შუადღემდე იყიდება ხოლმე.",
        "ის დიდხანს ვაჭრობდა და კალათა ნახევარ ფასად იყიდა.",
        "ძვირი ქირის გამო ქუჩის პატარა მაღაზიები იკეტება.",
        "ტყის პირას კვლავ ნახეს მელია ლეკვებთან ერთად.",
        "მერცხლები ყოველ გაზაფხულზე ბრუნდებიან სახურავქვეშა ბუდეში.",
    ],
    "hy": [
        "Նավահանգստի շուկայում ձուկը սպառվում է կեսօրից առաջ։",
        "Նա երկար սակարկեց և զամբյուղը գնեց կես գնով։",
        "Թանկ վարձի պատճառով փողոցի փոքր խանութները փակվում են։",
        "Անտառի եզրին կրկին տեսել են աղվեսին իր ձագերի հետ։",
        "Ծիծեռնակները ամեն գարուն վերադառնում են տանիքի տակի բույնը։",
    ],
    "am": [
        "በወደቡ ገበያ ያለው ዓሣ ከቀትር በፊት ያልቃል።",
        "ረዥም ጊዜ ተከራክራ ቅርጫቱን በግማሽ ዋጋ ገዛች።",
        "ውድ ኪራይ በመንገዱ ያሉ ትናንሽ ሱቆችን እያዘጋ ነው።",
        "በጫካው ዳር ቀበሮ ከግልገሎቿ ጋር እንደገና ታየች።",
        "ዋኖሶች በየፀደዩ ወደ ጣሪያው ስር ጎጆአቸው ይመለሳሉ።",
    ],
}

# --- slice B: emotions & friendship / craft & repair ------------------

RESERVE_B: dict[str, list[str]] = {
    "en": [
        "He finally forgave his brother after years of silence.",
        "Her kindness to strangers always surprised her colleagues.",
        "They laughed so hard at the old photos that they cried.",
        "The carpenter planed the door until it closed without a sound.",
        "He tightened every bolt on the bicycle before the long ride.",
    ],
    "de": [
        "Nach dem langen Streit haben sich die beiden endlich versöhnt.",
        "Ihre Geduld mit den Kindern rührte die ganze Nachbarschaft.",
        "Beim Abschied am Bahnhof flossen dann doch ein paar Tränen.",
        "Der Schreiner hobelte die Tür ab, bis sie nicht mehr klemmte.",
        "Er zog vor der Tour jede Schraube am Fahrrad nach.",
    ],
    "fr": [
        "Après des années de brouille, les deux sœurs se sont réconciliées.",
        "Sa gentillesse envers les inconnus étonnait tout le monde.",
        "Ils ont ri aux larmes en regardant les vieilles photos.",
        "Le menuisier a raboté la porte pour qu'elle ferme sans grincer.",
        "Il a resserré chaque boulon du vélo avant le grand départ.",
    ],
    "es": [
        "Después de tantos años por fin hizo las paces con su hermano.",
        "Su paciencia con los vecinos conmovía a todo el barrio.",
        "Se rieron hasta llorar mirando las fotos antiguas.",
        "El carpintero cepilló la puerta hasta que cerró sin rozar.",
        "Apretó todos los tornillos de la bicicleta antes del viaje.",
    ],
    "pt": [
        "Depois de anos sem se falarem, os irmãos fizeram as pazes.",
        "A paciência dela com os vizinhos comovia o bairro inteiro.",
        "Riram até chorar folheando as fotografias antigas.",
        "O marceneiro aplainou a porta até ela fechar sem raspar.",
        "Ele apertou todos os parafusos da bicicleta antes da viagem.",
    ],
    "it": [
        "Dopo anni di silenzio i due fratelli hanno fatto pace.",
        "La sua gentilezza con gli sconosciuti stupiva tutti.",
        "Hanno riso fino alle lacrime guardando le vecchie foto.",
        "Il falegname ha piallato la porta finché non ha smesso di strisciare.",
        "Ha stretto ogni bullone della bicicletta prima della partenza.",
    ],
    "nl": [
        "Na jaren van stilte hebben de broers het eindelijk bijgelegd.",
        "Haar geduld met de buren ontroerde de hele straat.",
        "Ze lachten tot ze huilden om de oude foto's.",
        "De timmerman schaafde de deur bij tot hij nergens meer aanliep.",
        "Hij draaide elke bout van de fiets vast voor de lange tocht.",
    ],
    "sv": [
        "Efter många års tystnad försonades bröderna till slut.",
        "Hennes tålamod med grannarna rörde hela kvarteret.",
        "De skrattade tills de grät åt de gamla fotografierna.",
        "Snickaren hyvlade dörren tills den gick att stänga utan gnissel.",
        "Han drog åt varje skruv på cykeln före den långa turen.",
    ],
    "da": [
        "Efter mange års tavshed blev brødrene endelig forsonet.",
        "Hendes tålmodighed med naboerne rørte hele gaden.",
        "De grinede til tårerne over de gamle fotografier.",
        "Snedkeren høvlede døren til, så den lukkede uden at binde.",
        "Han spændte hver eneste bolt på cyklen før den lange tur.",
    ],
    "cs": [
        "Po letech mlčení se bratři konečně usmířili.",
        "Její trpělivost se sousedy dojímala celou ulici.",
        "Nad starými fotkami se smáli, až jim tekly slzy.",
        "Truhlář dveře hobloval tak dlouho, až přestaly drhnout.",
        "Před dlouhou cestou dotáhl na kole každý šroub.",
    ],
    "pl": [
        "Po latach milczenia bracia wreszcie się pogodzili.",
        "Jej cierpliwość do sąsiadów wzruszała całą ulicę.",
        "Śmiali się do łez, oglądając stare fotografie.",
        "Stolarz strugał drzwi tak długo, aż przestały haczyć.",
        "Przed długą trasą dokręcił każdą śrubę w rowerze.",
    ],
    "ru": [
        "После долгих лет молчания братья наконец помирились.",
        "Её терпение к соседям трогало весь двор.",
        "Они смеялись до слёз над старыми фотографиями.",
        "Столяр строгал дверь, пока она не перестала цепляться.",
        "Перед дальней поездкой он подтянул каждый болт на велосипеде.",
    ],
    "uk": [
        "Після довгих років мовчання брати нарешті помирилися.",
        "Її терпіння до сусідів зворушувало весь двір.",
        "Вони сміялися до сліз над старими світлинами.",
        "Столяр стругав двері, доки вони не перестали чіплятися.",
        "Перед далекою дорогою він підтягнув кожен болт на велосипеді.",
    ],
    "bg": [
        "След години мълчание братята най-после се сдобриха.",
        "Търпението ѝ към съседите трогваше цялата улица.",
        "Смяха се до сълзи над старите снимки.",
        "Дърводелецът рендосва вратата, докато спря да запъва.",
        "Преди дългия път той затегна всеки болт на колелото.",
    ],
    "hr": [
        "Nakon godina šutnje braća su se napokon pomirila.",
        "Njezino strpljenje sa susjedima ganulo je cijelu ulicu.",
        "Smijali su se do suza nad starim fotografijama.",
        "Stolar je blanjao vrata dok nisu prestala zapinjati.",
        "Prije dugog puta pritegnuo je svaki vijak na biciklu.",
    ],
    "ro": [
        "După ani de tăcere, frații s-au împăcat în sfârșit.",
        "Răbdarea ei cu vecinii emoționa toată strada.",
        "Au râs până la lacrimi uitându-se la pozele vechi.",
        "Tâmplarul a dat la rindea ușa până n-a mai agățat pragul.",
        "Înainte de drumul lung a strâns fiecare șurub de la bicicletă.",
    ],
    "hu": [
        "Hosszú évek hallgatása után a testvérek végre kibékültek.",
        "A szomszédokkal való türelme az egész utcát meghatotta.",
        "A régi fényképeken könnyesre nevették magukat.",
        "Az asztalos addig gyalulta az ajtót, míg többé nem akadt el.",
        "A hosszú út előtt minden csavart meghúzott a biciklin.",
    ],
    "fi": [
        "Vuosien hiljaisuuden jälkeen veljekset tekivät vihdoin sovinnon.",
        "Hänen kärsivällisyytensä naapureita kohtaan liikutti koko katua.",
        "He nauroivat kyyneliin asti vanhoja valokuvia katsellessaan.",
        "Puuseppä höyläsi ovea, kunnes se lakkasi ottamasta kiinni.",
        "Ennen pitkää matkaa hän kiristi pyörän jokaisen pultin.",
    ],
    "tr": [
        "Yıllarca süren küslükten sonra kardeşler sonunda barıştı.",
        "Komşulara gösterdiği sabır bütün mahalleyi duygulandırdı.",
        "Eski fotoğraflara bakarken gülmekten gözleri yaşardı.",
        "Marangoz kapıyı sürtmez olana kadar rendeledi.",
        "Uzun yolculuktan önce bisikletin her cıvatasını sıktı.",
    ],
    "id": [
        "Setelah bertahun-tahun berdiam, kedua kakak beradik itu akhirnya berbaikan.",
        "Kesabarannya kepada para tetangga menyentuh seisi gang.",
        "Mereka tertawa sampai menangis melihat foto-foto lama.",
        "Tukang kayu menyerut pintu itu sampai tidak menyangkut lagi.",
        "Sebelum perjalanan jauh ia mengencangkan semua baut sepedanya.",
    ],
    "vi": [
        "Sau nhiều năm im lặng, hai anh em cuối cùng đã làm lành.",
        "Sự kiên nhẫn của cô với hàng xóm khiến cả xóm cảm động.",
        "Họ cười chảy nước mắt khi xem lại những tấm ảnh cũ.",
        "Người thợ mộc bào cánh cửa đến khi nó đóng êm không kẹt.",
        "Trước chuyến đi xa anh siết lại từng con ốc trên chiếc xe đạp.",
    ],
    "sw": [
        "Baada ya miaka ya kimya, ndugu hao hatimaye walipatana.",
        "Subira yake kwa majirani iligusa mtaa mzima.",
        "Walicheka hadi machozi wakitazama picha za zamani.",
        "Seremala alirandarada mlango hadi ukaacha kukwama.",
        "Kabla ya safari ndefu alikaza kila parafujo ya baiskeli.",
    ],
    "el": [
        "Ύστερα από χρόνια σιωπής τα αδέρφια επιτέλους τα βρήκαν.",
        "Η υπομονή της με τους γείτονες συγκινούσε όλη τη γειτονιά.",
        "Γέλασαν μέχρι δακρύων βλέποντας τις παλιές φωτογραφίες.",
        "Ο μαραγκός πλάνισε την πόρτα ώσπου έκλεισε χωρίς να τρίζει.",
        "Πριν από το μεγάλο ταξίδι έσφιξε κάθε βίδα στο ποδήλατο.",
    ],
    "ar": [
        "بعد سنوات من القطيعة تصالح الأخوان أخيرا.",
        "كان صبرها على الجيران يؤثر في الحارة كلها.",
        "ضحكوا حتى دمعت عيونهم وهم يقلبون الصور القديمة.",
        "ظل النجار يسوي الباب حتى صار يغلق بلا احتكاك.",
        "شد كل برغي في الدراجة قبل الرحلة الطويلة.",
    ],
    "fa": [
        "پس از سال‌ها قهر، دو برادر سرانجام آشتی کردند.",
        "صبوری او با همسایه‌ها همه محله را تحت تأثیر گذاشت.",
        "با دیدن عکس‌های قدیمی آن‌قدر خندیدند که اشکشان درآمد.",
        "نجار در را آن‌قدر رنده کرد تا دیگر گیر نکند.",
        "پیش از سفر دراز همه پیچ‌های دوچرخه را سفت کرد.",
    ],
    "ur": [
        "برسوں کی ناراضی کے بعد دونوں بھائیوں میں آخرکار صلح ہو گئی۔",
        "پڑوسیوں کے ساتھ اس کے صبر نے پورے محلے کو متاثر کیا۔",
        "پرانی تصویریں دیکھ کر وہ ہنستے ہنستے رو پڑے۔",
        "بڑھئی دروازہ اس وقت تک رندتا رہا جب تک وہ اٹکنا بند نہ ہوا۔",
        "لمبے سفر سے پہلے اس نے سائیکل کا ہر پیچ کس دیا۔",
    ],
    "he": [
        "אחרי שנים של נתק האחים סוף סוף התפייסו.",
        "הסבלנות שלה כלפי השכנים ריגשה את כל הרחוב.",
        "הם צחקו עד דמעות מול התמונות הישנות.",
        "הנגר הקציע את הדלת עד שנסגרה בלי לחרוק.",
        "לפני הנסיעה הארוכה הוא הידק כל בורג באופניים.",
    ],
    "hi": [
        "बरसों की चुप्पी के बाद दोनों भाइयों में आखिरकार सुलह हो गई।",
        "पड़ोसियों के प्रति उसके धैर्य ने पूरे मोहल्ले का दिल छू लिया।",
        "पुरानी तस्वीरें देखकर वे हँसते-हँसते रो पड़े।",
        "बढ़ई दरवाज़े को तब तक रंदे से घिसता रहा जब तक वह अटकना बंद न हुआ।",
        "लंबे सफ़र से पहले उसने साइकिल का हर पेच कस दिया।",
    ],
    "bn": [
        "বহু বছরের নীরবতার পর দুই ভাই অবশেষে মিটমাট করল।",
        "প্রতিবেশীদের প্রতি তার ধৈর্য পুরো পাড়াকে ছুঁয়ে গেল।",
        "পুরোনো ছবি দেখে তারা হাসতে হাসতে কেঁদে ফেলল।",
        "ছুতোর দরজাটা ততক্ষণ রাঁদা করল যতক্ষণ না সেটা আটকানো বন্ধ হলো।",
        "লম্বা যাত্রার আগে সে সাইকেলের প্রতিটি স্ক্রু শক্ত করে দিল।",
    ],
    "ta": [
        "பல ஆண்டு மௌனத்துக்குப் பிறகு இரு சகோதரர்களும் இறுதியாக சமாதானமானார்கள்.",
        "அண்டை வீட்டாரிடம் அவள் காட்டிய பொறுமை தெருவையே நெகிழ வைத்தது.",
        "பழைய புகைப்படங்களைப் பார்த்து அவர்கள் கண்ணீர் வரும்வரை சிரித்தார்கள்.",
        "தச்சர் கதவு மாட்டிக்கொள்ளாமல் மூடும்வரை அதை இழைத்தார்.",
        "நீண்ட பயணத்துக்கு முன் மிதிவண்டியின் ஒவ்வொரு திருகையும் இறுக்கினான்.",
    ],
    "te": [
        "ఎన్నో ఏళ్ల మౌనం తరువాత అన్నదమ్ములు చివరికి రాజీపడ్డారు.",
        "పొరుగువారి పట్ల ఆమె ఓర్పు వీధి మొత్తాన్ని కదిలించింది.",
        "పాత ఫోటోలు చూస్తూ వాళ్ళు కన్నీళ్లు వచ్చేదాకా నవ్వారు.",
        "వడ్రంగి తలుపు ఇరుక్కోకుండా మూసుకునే దాకా చెక్కుతూనే ఉన్నాడు.",
        "పొడవైన ప్రయాణానికి ముందు సైకిల్ లోని ప్రతి మరను బిగించాడు.",
    ],
    "th": [
        "หลังจากเงียบหายไปหลายปีสองพี่น้องก็คืนดีกันในที่สุด",
        "ความอดทนของเธอต่อเพื่อนบ้านทำให้ทั้งซอยประทับใจ",
        "พวกเขาหัวเราะจนน้ำตาไหลเมื่อดูรูปถ่ายเก่า",
        "ช่างไม้ไสประตูจนปิดได้สนิทโดยไม่ติดขัด",
        "ก่อนเดินทางไกลเขาขันน็อตทุกตัวของจักรยานให้แน่น",
    ],
    "ko": [
        "오랜 침묵 끝에 두 형제는 마침내 화해했다.",
        "이웃을 대하는 그녀의 인내심이 온 동네를 감동시켰다.",
        "그들은 옛 사진을 보며 눈물이 나도록 웃었다.",
        "목수는 문이 걸리지 않고 닫힐 때까지 대패질을 했다.",
        "긴 여행을 앞두고 그는 자전거의 나사를 모두 조였다.",
    ],
    "ja": [
        "長い沈黙の末に兄弟はようやく仲直りした。",
        "隣人への彼女の辛抱強さは町内の皆を感動させた。",
        "古い写真を見ながら涙が出るほど笑った。",
        "大工は扉が引っかからずに閉まるまで鉋をかけた。",
        "長旅の前に彼は自転車のねじを全部締め直した。",
    ],
    "zh": [
        "沉默多年之后兄弟俩终于和好了。",
        "她对邻居的耐心感动了整条街的人。",
        "他们翻看旧照片笑得眼泪都流出来了。",
        "木匠把门刨了又刨直到关上时不再卡住。",
        "长途骑行前他把自行车上的每颗螺丝都拧紧了。",
    ],
    "ka": [
        "მრავალწლიანი დუმილის შემდეგ ძმები ბოლოს შერიგდნენ.",
        "მისმა მოთმინებამ მეზობლების მიმართ მთელი ქუჩა აღძრა.",
        "ძველ სურათებს რომ ათვალიერებდნენ, ცრემლებამდე იცინეს.",
        "დურგალი კარს მანამ რანდავდა, სანამ უხმაუროდ არ დაიკეტა.",
        "გრძელ მგზავრობამდე ველოსიპედის ყველა ჭანჭიკი მოუჭირა.",
    ],
    "hy": [
        "Երկար տարիների լռությունից հետո եղբայրները վերջապես հաշտվեցին։",
        "Հարևանների հանդեպ նրա համբերությունը հուզում էր ամբողջ փողոցը։",
        "Հին լուսանկարները նայելիս ծիծաղեցին մինչև արցունքներ։",
        "Ատաղձագործը ռանդում էր դուռը, մինչև այն դադարեց կպչել։",
        "Երկար ճանապարհից առաջ նա ձգեց հեծանվի բոլոր պտուտակները։",
    ],
    "am": [
        "ከብዙ ዓመታት ዝምታ በኋላ ወንድማማቾቹ በመጨረሻ ታረቁ።",
        "ለጎረቤቶች ያላት ትዕግሥት መንደሩን ሁሉ አስደነቀ።",
        "የቆዩ ፎቶዎችን እያዩ እስከ እንባ ድረስ ሳቁ።",
        "አናጢው በሩ ሳይያዝ እስኪዘጋ ድረስ ላጠው።",
        "ከረዥም ጉዞ በፊት የብስክሌቱን እያንዳንዱን ብሎን አጠበቀ።",
    ],
}


# --- slice C: sea & boats / games & childhood (round 13, authored
# BEFORE the sibling-language expansion was evaluated — rule 4: a
# replacement slice must exist before any model change is scored.
# Covers the prospective 42-language class set (the 38 shipped + the
# four sibling candidates no/sk/ms/sr); the four new languages' rows
# are sealed dev-free material for whichever round ships them. The
# sibling vocabularies were written AFTER this slice was sealed, from
# the author's own knowledge and without consulting it. ---------------

RESERVE_C: dict[str, list[str]] = {
    "en": [
        "The ferry was delayed because of strong currents in the strait.",
        "They pulled the nets in at dawn before the wind picked up.",
        "The lighthouse keeper logged every ship that passed the cape.",
        "The children played hide and seek behind the old schoolyard wall.",
        "She taught her little brother to fly a kite on windy afternoons.",
    ],
    "de": [
        "Die Fähre verspätete sich wegen der starken Strömung im Sund.",
        "Im Morgengrauen zogen die Fischer ihre Netze ein.",
        "Der Leuchtturmwärter notierte jedes Schiff, das die Landspitze passierte.",
        "Die Kinder spielten Verstecken hinter der alten Schulhofmauer.",
        "Sie brachte ihrem kleinen Bruder das Drachensteigen bei.",
    ],
    "fr": [
        "Le bac a pris du retard à cause des forts courants du détroit.",
        "Les pêcheurs ont remonté leurs filets à l'aube.",
        "Le gardien du phare notait chaque navire qui doublait le cap.",
        "Les enfants jouaient à cache-cache derrière le mur de l'école.",
        "Elle a appris à son petit frère à faire voler un cerf-volant.",
    ],
    "es": [
        "El ferry se retrasó por las fuertes corrientes del estrecho.",
        "Los pescadores recogieron las redes al amanecer.",
        "El farero anotaba cada barco que doblaba el cabo.",
        "Los niños jugaban al escondite detrás del muro de la escuela.",
        "Le enseñó a su hermanito a volar una cometa en la playa.",
    ],
    "pt": [
        "A balsa atrasou por causa das correntes fortes do estreito.",
        "Os pescadores recolheram as redes de madrugada.",
        "O faroleiro anotava cada navio que dobrava o cabo.",
        "As crianças brincavam de esconde-esconde atrás do muro da escola.",
        "Ela ensinou o irmãozinho a empinar pipa na praia.",
    ],
    "it": [
        "Il traghetto è in ritardo per le forti correnti dello stretto.",
        "I pescatori hanno tirato su le reti all'alba.",
        "Il guardiano del faro annotava ogni nave che doppiava il capo.",
        "I bambini giocavano a nascondino dietro il muro della scuola.",
        "Ha insegnato al fratellino a far volare l'aquilone.",
    ],
    "nl": [
        "De veerboot had vertraging door de sterke stroming in de zeestraat.",
        "De vissers haalden hun netten bij zonsopgang binnen.",
        "De vuurtorenwachter noteerde elk schip dat de kaap rondde.",
        "De kinderen speelden verstoppertje achter de schoolmuur.",
        "Ze leerde haar broertje vliegeren op het strand.",
    ],
    "sv": [
        "Färjan blev försenad av de starka strömmarna i sundet.",
        "Fiskarna drog upp näten i gryningen.",
        "Fyrvaktaren antecknade varje fartyg som rundade udden.",
        "Barnen lekte kurragömma bakom skolgårdens mur.",
        "Hon lärde sin lillebror att flyga drake på stranden.",
    ],
    "da": [
        "Færgen blev forsinket af de stærke strømme i sundet.",
        "Fiskerne trak nettene op ved daggry.",
        "Fyrmesteren noterede hvert skib, der rundede pynten.",
        "Børnene legede gemmeleg bag skolegårdens mur.",
        "Hun lærte sin lillebror at flyve med drage på stranden.",
    ],
    "no": [
        "Fergen ble forsinket av de sterke strømmene i sundet.",
        "Fiskerne trakk opp garnene ved daggry.",
        "Fyrvokteren noterte hvert skip som rundet neset.",
        "Barna lekte gjemsel bak skolegårdens mur.",
        "Hun lærte lillebroren sin å fly drage på stranden.",
    ],
    "cs": [
        "Trajekt měl zpoždění kvůli silným proudům v úžině.",
        "Rybáři za úsvitu vytáhli sítě.",
        "Strážce majáku zapisoval každou loď, která obeplula mys.",
        "Děti si hrály na schovávanou za zdí školního dvora.",
        "Naučila mladšího bratra pouštět draka na pláži.",
    ],
    "sk": [
        "Trajekt meškal kvôli silným prúdom v úžine.",
        "Rybári za úsvitu vytiahli siete.",
        "Strážca majáka zapisoval každú loď, ktorá oboplávala mys.",
        "Deti sa hrali na schovávačku za múrom školského dvora.",
        "Naučila mladšieho brata púšťať šarkana na pláži.",
    ],
    "pl": [
        "Prom się spóźnił z powodu silnych prądów w cieśninie.",
        "Rybacy wyciągnęli sieci o świcie.",
        "Latarnik zapisywał każdy statek opływający przylądek.",
        "Dzieci bawiły się w chowanego za murem szkolnego podwórka.",
        "Nauczyła młodszego brata puszczać latawca na plaży.",
    ],
    "ru": [
        "Паром задержался из-за сильных течений в проливе.",
        "Рыбаки вытащили сети на рассвете.",
        "Смотритель маяка записывал каждое судно, огибавшее мыс.",
        "Дети играли в прятки за стеной школьного двора.",
        "Она научила младшего брата запускать воздушного змея.",
    ],
    "uk": [
        "Пором запізнився через сильні течії в протоці.",
        "Рибалки витягли сіті на світанку.",
        "Доглядач маяка записував кожне судно, що огинало мис.",
        "Діти гралися в хованки за муром шкільного двору.",
        "Вона навчила молодшого брата запускати повітряного змія.",
    ],
    "bg": [
        "Фериботът закъсня заради силните течения в протока.",
        "Рибарите изтеглиха мрежите на разсъмване.",
        "Пазачът на фара записваше всеки кораб, който заобикаляше носа.",
        "Децата играеха на криеница зад стената на училищния двор.",
        "Тя научи малкия си брат да пуска хвърчило на плажа.",
    ],
    "hr": [
        "Trajekt je kasnio zbog jakih struja u tjesnacu.",
        "Ribari su u zoru izvukli mreže.",
        "Svjetioničar je bilježio svaki brod koji je obilazio rt.",
        "Djeca su se igrala skrivača iza zida školskog dvorišta.",
        "Naučila je mlađeg brata puštati zmaja na plaži.",
    ],
    "sr": [
        "Trajekt je kasnio zbog jakih struja u moreuzu.",
        "Ribari su u zoru izvukli mreže iz reke.",
        "Svetioničar je beležio svaki brod koji je obilazio rt.",
        "Deca su se igrala žmurke iza zida školskog dvorišta.",
        "Naučila je mlađeg brata da pušta zmaja na plaži.",
    ],
    "ro": [
        "Feribotul a întârziat din cauza curenților puternici din strâmtoare.",
        "Pescarii au tras năvoadele în zori.",
        "Paznicul farului nota fiecare vapor care ocolea capul.",
        "Copiii se jucau de-a v-ați ascunselea după zidul curții școlii.",
        "Și-a învățat frățiorul să înalțe un zmeu pe plajă.",
    ],
    "hu": [
        "A komp késett a szorosban örvénylő erős áramlatok miatt.",
        "A halászok hajnalban húzták be a hálókat.",
        "A világítótorony őre feljegyzett minden hajót, amely megkerülte a fokot.",
        "A gyerekek bújócskáztak az iskolaudvar fala mögött.",
        "Megtanította a kisöccsét sárkányt ereszteni a parton.",
    ],
    "fi": [
        "Lautta myöhästyi salmen voimakkaiden virtausten takia.",
        "Kalastajat nostivat verkot aamunkoitteessa.",
        "Majakanvartija kirjasi jokaisen niemen ohittaneen aluksen.",
        "Lapset leikkivät piilosta koulun pihamuurin takana.",
        "Hän opetti pikkuveljensä lennättämään leijaa rannalla.",
    ],
    "tr": [
        "Feribot boğazdaki güçlü akıntılar yüzünden gecikti.",
        "Balıkçılar ağları şafakta çekti.",
        "Deniz feneri bekçisi burnu dönen her gemiyi kaydediyordu.",
        "Çocuklar okul bahçesinin duvarının arkasında saklambaç oynadı.",
        "Küçük kardeşine sahilde uçurtma uçurmayı öğretti.",
    ],
    "id": [
        "Feri tertunda karena arus kuat di selat.",
        "Para nelayan menarik jala saat fajar.",
        "Penjaga mercusuar mencatat setiap kapal yang melewati tanjung.",
        "Anak-anak bermain petak umpet di belakang tembok sekolah.",
        "Dia mengajari adiknya menerbangkan layang-layang di pantai.",
    ],
    "ms": [
        "Feri itu lewat kerana arus deras di selat.",
        "Para nelayan menarik pukat pada waktu subuh.",
        "Penjaga rumah api mencatat setiap kapal yang melepasi tanjung.",
        "Kanak-kanak bermain sorok-sorok di belakang tembok sekolah.",
        "Dia mengajar adiknya bermain layang-layang di pantai.",
    ],
    "vi": [
        "Chuyến phà bị trễ vì dòng chảy mạnh ở eo biển.",
        "Ngư dân kéo lưới lên lúc rạng sáng.",
        "Người gác hải đăng ghi lại từng con tàu vòng qua mũi đất.",
        "Bọn trẻ chơi trốn tìm sau bức tường sân trường.",
        "Cô dạy em trai thả diều trên bãi biển.",
    ],
    "sw": [
        "Kivuko kilichelewa kwa sababu ya mikondo mikali ya mlangobahari.",
        "Wavuvi walivuta nyavu zao alfajiri.",
        "Mlinzi wa mnara wa taa aliandika kila meli iliyopita rasi.",
        "Watoto walicheza kujificha nyuma ya ukuta wa shule.",
        "Alimfundisha mdogo wake kurusha tiara ufukweni.",
    ],
    "el": [
        "Το πλοίο της γραμμής καθυστέρησε λόγω των ισχυρών ρευμάτων του στενού.",
        "Οι ψαράδες τράβηξαν τα δίχτυα τα χαράματα.",
        "Ο φαροφύλακας κατέγραφε κάθε καράβι που περνούσε το ακρωτήρι.",
        "Τα παιδιά έπαιζαν κρυφτό πίσω από τον μαντρότοιχο του σχολείου.",
        "Έμαθε στον μικρό της αδερφό να πετάει χαρταετό στην παραλία.",
    ],
    "ar": [
        "تأخرت العبارة بسبب التيارات القوية في المضيق.",
        "سحب الصيادون شباكهم عند الفجر.",
        "سجل حارس المنارة كل سفينة مرت بالرأس.",
        "لعب الأطفال الغميضة خلف سور ساحة المدرسة.",
        "علمت أخاها الصغير إطلاق طائرة ورقية على الشاطئ.",
    ],
    "fa": [
        "کشتی مسافربری به خاطر جریان‌های تند تنگه دیر رسید.",
        "ماهیگیران هنگام سپیده‌دم تورها را بالا کشیدند.",
        "نگهبان فانوس دریایی هر کشتی را که از دماغه می‌گذشت ثبت می‌کرد.",
        "بچه‌ها پشت دیوار حیاط مدرسه قایم‌باشک بازی می‌کردند.",
        "او به برادر کوچکش یاد داد در ساحل بادبادک هوا کند.",
    ],
    "ur": [
        "آبنائے کی تیز لہروں کی وجہ سے فیری دیر سے پہنچی۔",
        "مچھیروں نے پو پھٹتے ہی جال کھینچ لیے۔",
        "لائٹ ہاؤس کے نگران نے راس سے گزرنے والا ہر جہاز درج کیا۔",
        "بچے اسکول کے صحن کی دیوار کے پیچھے چھپن چھپائی کھیلتے رہے۔",
        "اس نے اپنے چھوٹے بھائی کو ساحل پر پتنگ اڑانا سکھایا۔",
    ],
    "he": [
        "המעבורת התעכבה בגלל זרמים חזקים במצר.",
        "הדייגים משכו את הרשתות עם שחר.",
        "שומר המגדלור רשם כל ספינה שחלפה על פני הכף.",
        "הילדים שיחקו מחבואים מאחורי חומת חצר בית הספר.",
        "היא לימדה את אחיה הקטן להעיף עפיפון בחוף.",
    ],
    "hi": [
        "जलडमरूमध्य की तेज़ धाराओं के कारण नौका देर से पहुँची।",
        "मछुआरों ने भोर होते ही जाल खींच लिए।",
        "प्रकाशस्तंभ के रखवाले ने अंतरीप से गुज़रने वाला हर जहाज़ दर्ज किया।",
        "बच्चे स्कूल के आँगन की दीवार के पीछे छुपन-छुपाई खेलते रहे।",
        "उसने अपने छोटे भाई को समुद्र तट पर पतंग उड़ाना सिखाया।",
    ],
    "bn": [
        "প্রণালীর প্রবল স্রোতের কারণে ফেরিটি দেরি করল।",
        "জেলেরা ভোরে জাল টেনে তুলল।",
        "বাতিঘরের রক্ষক অন্তরীপ পেরোনো প্রতিটি জাহাজ লিখে রাখতেন।",
        "বাচ্চারা স্কুলের উঠোনের দেয়ালের পেছনে লুকোচুরি খেলছিল।",
        "সে তার ছোট ভাইকে সৈকতে ঘুড়ি ওড়ানো শেখাল।",
    ],
    "ta": [
        "நீரிணையின் கடுமையான நீரோட்டங்களால் படகு தாமதமானது.",
        "மீனவர்கள் விடியற்காலையில் வலைகளை இழுத்தனர்.",
        "கலங்கரை விளக்கக் காவலர் முனையைக் கடந்த ஒவ்வொரு கப்பலையும் பதிவு செய்தார்.",
        "குழந்தைகள் பள்ளி முற்றத்துச் சுவருக்குப் பின்னால் கண்ணாமூச்சி விளையாடினர்.",
        "அவள் தன் தம்பிக்குக் கடற்கரையில் பட்டம் விடக் கற்றுக்கொடுத்தாள்.",
    ],
    "te": [
        "జలసంధిలో బలమైన ప్రవాహాల వల్ల పడవ ఆలస్యమైంది.",
        "జాలర్లు తెల్లవారుజామున వలలు లాగారు.",
        "దీపస్తంభ కాపలాదారు అగ్రం దాటిన ప్రతి ఓడను నమోదు చేసేవాడు.",
        "పిల్లలు బడి ఆవరణ గోడ వెనుక దాగుడుమూతలు ఆడారు.",
        "ఆమె తన తమ్ముడికి సముద్రతీరంలో గాలిపటం ఎగరేయడం నేర్పింది.",
    ],
    "th": [
        "เรือข้ามฟากล่าช้าเพราะกระแสน้ำเชี่ยวในช่องแคบ",
        "ชาวประมงสาวอวนขึ้นตอนรุ่งสาง",
        "ผู้ดูแลประภาคารจดบันทึกเรือทุกลำที่ผ่านแหลม",
        "เด็กๆ เล่นซ่อนหาหลังกำแพงสนามโรงเรียน",
        "เธอสอนน้องชายเล่นว่าวที่ชายหาด",
    ],
    "ko": [
        "해협의 거센 물살 때문에 연락선이 늦어졌다.",
        "어부들은 동틀 녘에 그물을 끌어올렸다.",
        "등대지기는 곶을 지나는 배를 일일이 기록했다.",
        "아이들은 학교 운동장 담장 뒤에서 숨바꼭질을 했다.",
        "그녀는 남동생에게 바닷가에서 연 날리는 법을 가르쳤다.",
    ],
    "ja": [
        "海峡の強い潮流のせいで連絡船が遅れた。",
        "漁師たちは夜明けに網を引き上げた。",
        "灯台守は岬を回るすべての船を記録していた。",
        "子どもたちは校庭の塀の裏でかくれんぼをした。",
        "彼女は弟に浜辺で凧の揚げ方を教えた。",
    ],
    "zh": [
        "渡轮因海峡中强劲的水流而误点了。",
        "渔民们在黎明时分收起了渔网。",
        "灯塔看守人记录下绕过海角的每一艘船。",
        "孩子们在学校院墙后面捉迷藏。",
        "她教弟弟在海滩上放风筝。",
    ],
    "ka": [
        "ბორანი დაგვიანდა სრუტის ძლიერი დინებების გამო.",
        "მეთევზეებმა გამთენიისას ამოათრიეს ბადეები.",
        "შუქურის მცველი იწერდა ყველა გემს, რომელიც კონცხს უვლიდა.",
        "ბავშვები დამალობანას თამაშობდნენ სკოლის ეზოს კედლის უკან.",
        "მან უმცროს ძმას სანაპიროზე ფრანის გაშვება ასწავლა.",
    ],
    "hy": [
        "Լաստանավը ուշացավ նեղուցի ուժեղ հոսանքների պատճառով։",
        "Ձկնորսները լուսադեմին դուրս քաշեցին ցանցերը։",
        "Փարոսի պահակը գրանցում էր հրվանդանը շրջանցող ամեն նավ։",
        "Երեխաները պահմտոցի էին խաղում դպրոցի բակի պատի հետևում։",
        "Նա փոքր եղբորը սովորեցրեց օդապարուկ թռցնել ծովափին։",
    ],
    "am": [
        "ጀልባዋ በባህር ወሽመጡ ኃይለኛ ሞገድ ምክንያት ዘገየች።",
        "ዓሣ አጥማጆቹ ንጋት ላይ መረቦቻቸውን ጎተቱ።",
        "የመብራት ማማው ጠባቂ ጫፉን የሚያልፈውን እያንዳንዱን መርከብ ይመዘግብ ነበር።",
        "ልጆቹ ከትምህርት ቤቱ ግቢ ግድግዳ ጀርባ ድብብቆሽ ተጫወቱ።",
        "ለታናሽ ወንድሟ በባህር ዳርቻ ካይት ማብረር አስተማረችው።",
    ],
}

# --- slice D: post & letters / sleep & dreams --------------------------
# Authored round 14 BEFORE any round-14 model change was evaluated
# (rule 4: this round plans to open B after the uk/ru + Romance retrain
# and C if the da/no sibling pilot ships — D is the replacement sealed
# slice so at least one sealed reserve survives the round). 42
# languages (the 38 shipped + the four sibling candidates no/sk/ms/sr,
# sr in Latin script to match its seed vocabulary), 5 sentences each,
# domains disjoint from every prior eval corpus.

RESERVE_D: dict[str, list[str]] = {
    "en": [
        "The postman leaves our letters in the blue box by the gate.",
        "She bought stamps and mailed the parcel before the office closed.",
        "His reply arrived two weeks after I had sent my letter.",
        "I fell asleep before midnight and dreamed about the old house.",
        "He woke up early, long before the alarm clock rang.",
    ],
    "de": [
        "Der Briefträger bringt die Post jeden Morgen gegen neun Uhr.",
        "Sie klebte eine Briefmarke auf den Umschlag und warf ihn ein.",
        "Das Paket aus der Hauptstadt kam erst nach zwei Wochen an.",
        "Ich bin gestern vor Mitternacht eingeschlafen und habe tief geträumt.",
        "Er wachte lange vor dem Wecker auf und blieb noch liegen.",
    ],
    "fr": [
        "Le facteur dépose le courrier dans la boîte près du portail.",
        "Elle a collé un timbre sur l'enveloppe avant de la poster.",
        "Sa réponse est arrivée deux semaines après ma lettre.",
        "Je me suis endormi avant minuit et j'ai rêvé de la vieille maison.",
        "Il s'est réveillé bien avant la sonnerie du réveil.",
    ],
    "es": [
        "El cartero deja las cartas en el buzón junto a la puerta.",
        "Compró sellos y envió el paquete antes de que cerraran la oficina.",
        "Su respuesta llegó dos semanas después de mi carta.",
        "Me dormí antes de medianoche y soñé con la casa vieja.",
        "Se despertó mucho antes de que sonara el despertador.",
    ],
    "it": [
        "Il postino lascia le lettere nella cassetta accanto al cancello.",
        "Ha comprato i francobolli e ha spedito il pacco prima della chiusura.",
        "La sua risposta è arrivata due settimane dopo la mia lettera.",
        "Mi sono addormentato prima di mezzanotte e ho sognato la vecchia casa.",
        "Si è svegliato molto prima che suonasse la sveglia.",
    ],
    "pt": [
        "O carteiro deixa as cartas na caixa ao lado do portão.",
        "Ela comprou selos e enviou a encomenda antes de a agência fechar.",
        "A resposta dele chegou duas semanas depois da minha carta.",
        "Adormeci antes da meia-noite e sonhei com a casa antiga.",
        "Ele acordou muito antes de o despertador tocar.",
    ],
    "nl": [
        "De postbode stopt de brieven in de bus naast het hek.",
        "Ze plakte een postzegel op de envelop en verstuurde het pakje.",
        "Zijn antwoord kwam pas twee weken na mijn brief aan.",
        "Ik viel voor middernacht in slaap en droomde over het oude huis.",
        "Hij werd lang voor de wekker wakker en bleef nog even liggen.",
    ],
    "sv": [
        "Brevbäraren lämnar posten i den gröna lådan vid grinden.",
        "Hon köpte frimärken och skickade paketet innan kontoret stängde.",
        "Hans svar kom först två veckor efter mitt brev.",
        "Jag somnade före midnatt och drömde om det gamla huset.",
        "Han vaknade långt innan väckarklockan ringde.",
    ],
    "da": [
        "Postbuddet lægger brevene i den grønne kasse ved lågen.",
        "Hun købte frimærker og sendte pakken, inden kontoret lukkede.",
        "Hans svar kom først to uger efter mit brev.",
        "Jeg faldt i søvn før midnat og drømte om det gamle hus.",
        "Han vågnede længe før vækkeuret ringede.",
    ],
    "no": [
        "Postbudet legger brevene i den grønne kassen ved porten.",
        "Hun kjøpte frimerker og sendte pakken før kontoret stengte.",
        "Svaret hans kom først to uker etter brevet mitt.",
        "Jeg sovnet før midnatt og drømte om det gamle huset.",
        "Han våknet lenge før vekkerklokken ringte.",
    ],
    "fi": [
        "Postinkantaja jättää kirjeet vihreään laatikkoon portin viereen.",
        "Hän osti postimerkkejä ja lähetti paketin ennen konttorin sulkemista.",
        "Hänen vastauksensa saapui vasta kaksi viikkoa kirjeeni jälkeen.",
        "Nukahdin ennen keskiyötä ja näin unta vanhasta talosta.",
        "Hän heräsi kauan ennen herätyskellon soimista.",
    ],
    "pl": [
        "Listonosz zostawia listy w zielonej skrzynce przy furtce.",
        "Kupiła znaczki i wysłała paczkę, zanim urząd zamknięto.",
        "Jego odpowiedź przyszła dopiero dwa tygodnie po moim liście.",
        "Zasnąłem przed północą i śniłem o starym domu.",
        "Obudził się na długo przed dzwonkiem budzika.",
    ],
    "cs": [
        "Pošťák nechává dopisy v zelené schránce u branky.",
        "Koupila známky a poslala balík, než pošta zavřela.",
        "Jeho odpověď přišla až dva týdny po mém dopise.",
        "Usnul jsem před půlnocí a zdálo se mi o starém domě.",
        "Probudil se dlouho předtím, než zazvonil budík.",
    ],
    "sk": [
        "Poštár necháva listy v zelenej schránke pri bránke.",
        "Kúpila známky a poslala balík skôr, ako pošta zavrela.",
        "Jeho odpoveď prišla až dva týždne po mojom liste.",
        "Zaspal som pred polnocou a snívalo sa mi o starom dome.",
        "Zobudil sa dlho predtým, ako zazvonil budík.",
    ],
    "hr": [
        "Poštar ostavlja pisma u zelenom sandučiću kraj vrata.",
        "Kupila je marke i poslala paket prije nego što je ured zatvoren.",
        "Njegov je odgovor stigao tek dva tjedna nakon mog pisma.",
        "Zaspao sam prije ponoći i sanjao o staroj kući.",
        "Probudio se dugo prije nego što je budilica zazvonila.",
    ],
    "sr": [
        "Poštar ostavlja pisma u zelenom sandučetu pored kapije.",
        "Kupila je marke i poslala paket pre nego što je pošta zatvorena.",
        "Njegov odgovor je stigao tek dve nedelje posle mog pisma.",
        "Zaspao sam pre ponoći i sanjao o staroj kući.",
        "Probudio se dugo pre nego što je budilnik zazvonio.",
    ],
    "ro": [
        "Poștașul lasă scrisorile în cutia verde de lângă poartă.",
        "A cumpărat timbre și a trimis coletul înainte ca oficiul să se închidă.",
        "Răspunsul lui a sosit abia la două săptămâni după scrisoarea mea.",
        "Am adormit înainte de miezul nopții și am visat casa veche.",
        "S-a trezit cu mult înainte să sune ceasul deșteptător.",
    ],
    "hu": [
        "A postás a kapu melletti zöld ládába teszi a leveleket.",
        "Bélyegeket vett, és feladta a csomagot, mielőtt a hivatal bezárt.",
        "A válasza csak két héttel a levelem után érkezett meg.",
        "Éjfél előtt elaludtam, és a régi házról álmodtam.",
        "Jóval azelőtt felébredt, hogy megszólalt volna az ébresztőóra.",
    ],
    "tr": [
        "Postacı mektupları kapının yanındaki yeşil kutuya bırakıyor.",
        "Pul aldı ve postane kapanmadan paketi gönderdi.",
        "Cevabı mektubumdan ancak iki hafta sonra geldi.",
        "Gece yarısından önce uyudum ve eski evi rüyamda gördüm.",
        "Çalar saat çalmadan çok önce uyandı.",
    ],
    "id": [
        "Tukang pos meninggalkan surat di kotak hijau dekat pagar.",
        "Dia membeli perangko dan mengirim paket sebelum kantor pos tutup.",
        "Balasannya baru tiba dua minggu setelah surat saya.",
        "Saya tertidur sebelum tengah malam dan bermimpi tentang rumah lama.",
        "Dia bangun jauh sebelum jam weker berbunyi.",
    ],
    "ms": [
        "Posmen meletakkan surat di dalam peti hijau berhampiran pagar.",
        "Dia membeli setem dan menghantar bungkusan sebelum pejabat pos tutup.",
        "Balasannya hanya sampai dua minggu selepas surat saya.",
        "Saya tertidur sebelum tengah malam dan bermimpi tentang rumah lama kami.",
        "Dia bangun awal sekali sebelum jam loceng berbunyi.",
    ],
    "vi": [
        "Người đưa thư để lá thư vào hộp màu xanh cạnh cổng.",
        "Cô ấy mua tem và gửi bưu kiện trước khi bưu điện đóng cửa.",
        "Thư trả lời của anh ấy đến sau lá thư của tôi hai tuần.",
        "Tôi ngủ thiếp đi trước nửa đêm và mơ về ngôi nhà cũ.",
        "Anh ấy thức dậy rất lâu trước khi chuông đồng hồ reo.",
    ],
    "sw": [
        "Mtu wa posta huacha barua kwenye sanduku la kijani karibu na lango.",
        "Alinunua stempu na kutuma kifurushi kabla ofisi ya posta haijafungwa.",
        "Jibu lake lilifika wiki mbili baada ya barua yangu.",
        "Nililala kabla ya saa sita usiku na kuota nyumba ya zamani.",
        "Aliamka mapema sana kabla saa ya kengele haijalia.",
    ],
    "ru": [
        "Почтальон оставляет письма в зелёном ящике у калитки.",
        "Она купила марки и отправила посылку до закрытия почты.",
        "Его ответ пришёл только через две недели после моего письма.",
        "Я заснул до полуночи и видел во сне старый дом.",
        "Он проснулся задолго до звонка будильника.",
    ],
    "uk": [
        "Листоноша залишає листи в зеленій скриньці біля хвіртки.",
        "Вона купила марки й відправила посилку до закриття пошти.",
        "Його відповідь надійшла лише через два тижні після мого листа.",
        "Я заснув до півночі й бачив уві сні стару хату.",
        "Він прокинувся задовго до дзвінка будильника.",
    ],
    "bg": [
        "Пощальонът оставя писмата в зелената кутия до портата.",
        "Тя купи марки и изпрати колета, преди пощата да затвори.",
        "Отговорът му пристигна едва две седмици след моето писмо.",
        "Заспах преди полунощ и сънувах старата къща.",
        "Той се събуди много преди да звънне будилникът.",
    ],
    "el": [
        "Ο ταχυδρόμος αφήνει τα γράμματα στο πράσινο κουτί δίπλα στην πόρτα.",
        "Αγόρασε γραμματόσημα και έστειλε το δέμα πριν κλείσει το ταχυδρομείο.",
        "Η απάντησή του έφτασε δύο εβδομάδες μετά το γράμμα μου.",
        "Αποκοιμήθηκα πριν τα μεσάνυχτα και ονειρεύτηκα το παλιό σπίτι.",
        "Ξύπνησε πολύ πριν χτυπήσει το ξυπνητήρι.",
    ],
    "ar": [
        "يترك ساعي البريد الرسائل في الصندوق الأخضر قرب البوابة.",
        "اشترت طوابع وأرسلت الطرد قبل إغلاق مكتب البريد.",
        "وصل رده بعد أسبوعين من رسالتي.",
        "نمت قبل منتصف الليل وحلمت بالبيت القديم.",
        "استيقظ قبل رنين المنبه بوقت طويل.",
    ],
    "fa": [
        "نامه‌رسان نامه‌ها را در صندوق سبز کنار در می‌گذارد.",
        "او تمبر خرید و بسته را پیش از بسته شدن اداره پست فرستاد.",
        "پاسخ او دو هفته پس از نامه من رسید.",
        "پیش از نیمه‌شب خوابم برد و خواب خانه قدیمی را دیدم.",
        "او خیلی قبل از زنگ ساعت بیدار شد.",
    ],
    "he": [
        "הדוור משאיר את המכתבים בתיבה הירוקה ליד השער.",
        "היא קנתה בולים ושלחה את החבילה לפני שהדואר נסגר.",
        "התשובה שלו הגיעה שבועיים אחרי המכתב שלי.",
        "נרדמתי לפני חצות וחלמתי על הבית הישן.",
        "הוא התעורר הרבה לפני שהשעון המעורר צלצל.",
    ],
    "ur": [
        "ڈاکیا خط پھاٹک کے پاس سبز ڈبے میں ڈال جاتا ہے۔",
        "اس نے ٹکٹ خریدے اور ڈاکخانہ بند ہونے سے پہلے پارسل بھیج دیا۔",
        "اس کا جواب میرے خط کے دو ہفتے بعد پہنچا۔",
        "میں آدھی رات سے پہلے سو گیا اور پرانے گھر کا خواب دیکھا۔",
        "وہ الارم بجنے سے بہت پہلے جاگ گیا۔",
    ],
    "hi": [
        "डाकिया चिट्ठियाँ फाटक के पास हरे डिब्बे में डाल जाता है।",
        "उसने टिकट खरीदे और डाकघर बंद होने से पहले पार्सल भेज दिया।",
        "उसका जवाब मेरी चिट्ठी के दो हफ्ते बाद पहुँचा।",
        "मैं आधी रात से पहले सो गया और पुराने घर का सपना देखा।",
        "वह अलार्म बजने से बहुत पहले जाग गया।",
    ],
    "bn": [
        "ডাকপিয়ন চিঠিগুলো ফটকের পাশে সবুজ বাক্সে রেখে যায়।",
        "সে ডাকটিকিট কিনে ডাকঘর বন্ধ হওয়ার আগে পার্সেল পাঠিয়ে দিল।",
        "তার উত্তর আমার চিঠির দুই সপ্তাহ পরে পৌঁছাল।",
        "আমি মাঝরাতের আগে ঘুমিয়ে পড়লাম এবং পুরনো বাড়ির স্বপ্ন দেখলাম।",
        "ঘড়ির অ্যালার্ম বাজার অনেক আগেই সে জেগে উঠল।",
    ],
    "ta": [
        "தபால்காரர் கடிதங்களை வாசலருகில் உள்ள பச்சைப் பெட்டியில் போடுகிறார்.",
        "அவள் தபால்தலைகள் வாங்கி அலுவலகம் மூடும் முன் பார்சலை அனுப்பினாள்.",
        "என் கடிதத்திற்கு இரண்டு வாரங்கள் கழித்து அவரது பதில் வந்தது.",
        "நள்ளிரவுக்கு முன் தூங்கிவிட்டேன், பழைய வீட்டைக் கனவு கண்டேன்.",
        "அலாரம் அடிப்பதற்கு வெகு முன்பே அவன் விழித்துக்கொண்டான்.",
    ],
    "te": [
        "పోస్ట్‌మ్యాన్ ఉత్తరాలను గేటు పక్కన ఉన్న పచ్చ పెట్టెలో వేస్తాడు.",
        "ఆమె స్టాంపులు కొని పోస్టాఫీసు మూసే ముందు పార్సెల్ పంపింది.",
        "నా ఉత్తరానికి రెండు వారాల తరువాత అతని జవాబు వచ్చింది.",
        "అర్ధరాత్రికి ముందే నిద్రపోయి పాత ఇంటి గురించి కల కన్నాను.",
        "అలారం మోగడానికి చాలా ముందే అతను మేల్కొన్నాడు.",
    ],
    "th": [
        "บุรุษไปรษณีย์ทิ้งจดหมายไว้ในตู้สีเขียวข้างประตูรั้ว",
        "เธอซื้อแสตมป์และส่งพัสดุก่อนที่ทำการไปรษณีย์จะปิด",
        "คำตอบของเขามาถึงสองสัปดาห์หลังจดหมายของฉัน",
        "ฉันหลับไปก่อนเที่ยงคืนและฝันถึงบ้านหลังเก่า",
        "เขาตื่นก่อนนาฬิกาปลุกจะดังนานมาก",
    ],
    "ko": [
        "우체부는 대문 옆 초록색 우편함에 편지를 넣고 간다.",
        "그녀는 우표를 사서 우체국이 문을 닫기 전에 소포를 부쳤다.",
        "그의 답장은 내 편지보다 두 주 늦게 도착했다.",
        "나는 자정 전에 잠들어 옛집 꿈을 꾸었다.",
        "그는 자명종이 울리기 한참 전에 깨어났다.",
    ],
    "ja": [
        "郵便屋さんは門のそばの緑のポストに手紙を入れていく。",
        "彼女は切手を買って、郵便局が閉まる前に小包を送った。",
        "彼の返事は私の手紙から二週間後に届いた。",
        "真夜中前に眠ってしまい、古い家の夢を見た。",
        "彼は目覚まし時計が鳴るずっと前に目を覚ました。",
    ],
    "zh": [
        "邮递员把信放进大门旁边的绿色信箱里。",
        "她买了邮票，在邮局关门前把包裹寄了出去。",
        "他的回信在我的信寄出两周后才到。",
        "我在午夜前睡着了，梦见了那座老房子。",
        "闹钟响之前他早就醒了。",
    ],
    "am": [
        "ፖስተኛው ደብዳቤዎቹን በበሩ አጠገብ ባለው አረንጓዴ ሳጥን ውስጥ ያስቀምጣል።",
        "ቴምብር ገዝታ ፖስታ ቤቱ ከመዘጋቱ በፊት ጥቅሉን ላከች።",
        "መልሱ ከደብዳቤዬ ከሁለት ሳምንት በኋላ ደረሰ።",
        "ከእኩለ ሌሊት በፊት ተኛሁ እና ስለ አሮጌው ቤት አለምኩ።",
        "ሰዓቱ ከመጮኹ ከረጅም ጊዜ በፊት ነቃ።",
    ],
    "hy": [
        "Փոստատարը նամակները թողնում է դարպասի մոտ կանաչ արկղի մեջ։",
        "Նա նամականիշեր գնեց և ծանրոցն ուղարկեց փոստի փակվելուց առաջ։",
        "Նրա պատասխանը հասավ իմ նամակից երկու շաբաթ անց։",
        "Ես քնեցի կեսգիշերից առաջ և երազում տեսա հին տունը։",
        "Նա արթնացավ զարթուցիչի զանգից շատ առաջ։",
    ],
    "ka": [
        "ფოსტალიონი წერილებს ტოვებს ჭიშკართან მდგარ მწვანე ყუთში.",
        "მან მარკები იყიდა და ამანათი ფოსტის დაკეტვამდე გააგზავნა.",
        "მისი პასუხი ჩემი წერილიდან ორი კვირის შემდეგ მოვიდა.",
        "შუაღამემდე დავიძინე და ძველი სახლი დამესიზმრა.",
        "ის მაღვიძარას დარეკვამდე დიდი ხნით ადრე გაიღვიძა.",
    ],
}


def _score(slice_dict: dict[str, list[str]]) -> dict:
    import numpy as np

    from spatialpandas_spark.operators.langid import (
        builtin_langid_model,
        margins_kernel,
    )
    from tools.eval_langid_real import py_buckets

    m = builtin_langid_model()
    W = np.asarray(m["weights"], dtype=np.float64)
    I = np.asarray(m["intercepts"], dtype=np.float64)
    classes = list(m["classes"])
    per, correct, total = {}, 0, 0
    conf: dict[str, int] = {}
    for lang, sents in sorted(slice_dict.items()):
        marg = margins_kernel(
            [py_buckets(s, m) for s in sents], W, I, m.get("len_std")
        )
        preds = [classes[i] for i in np.argmax(marg, axis=1)]
        ok = sum(p == lang for p in preds)
        for p in preds:
            if p != lang:
                conf[f"{lang}->{p}"] = conf.get(f"{lang}->{p}", 0) + 1
        per[lang] = f"{ok}/{len(sents)}"
        correct += ok
        total += len(sents)
    return {
        "n": total,
        "accuracy": round(correct / total, 4),
        "per_lang": per,
        "confusions": dict(sorted(conf.items(), key=lambda kv: -kv[1])),
    }


def main() -> None:
    which = sys.argv[1].upper() if len(sys.argv) > 1 else None
    if which not in ("A", "B", "C", "D"):
        print(__doc__)
        print("pass A, B, C or D to OPEN (= consume) a reserve slice")
        return
    slices = {"A": RESERVE_A, "B": RESERVE_B, "C": RESERVE_C,
              "D": RESERVE_D}
    d = slices[which]
    # a reserve may cover languages the SHIPPED model does not know
    # yet (C holds the sibling candidates); score only the known ones
    from spatialpandas_spark.operators.langid import LANGS

    rep = _score({k: v for k, v in d.items() if k in LANGS})
    print(f"RESERVE_{which}: n={rep['n']} accuracy={rep['accuracy']}")
    for lg, v in sorted(rep["per_lang"].items()):
        print(f"  {lg}: {v}")
    if rep["confusions"]:
        print("confusions:", rep["confusions"])
    print(json.dumps({"slice": which, "n": rep["n"],
                      "accuracy": rep["accuracy"],
                      "confusions": rep["confusions"]}))
    print(f"\nREMINDER: update the STATUS registry in {__file__} "
          "and record the figure in BASELINE.md — this slice is now "
          "opened.")


if __name__ == "__main__":
    main()
