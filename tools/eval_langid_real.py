"""DEV-SET eval of the shipped language-ID model on REAL text.

The shipped model's held-out accuracy (BASELINE.md round 11) is
measured on a disjoint seed block of the SAME synthetic generator used
for training — it proves the train/serve machinery, not generalization.
This eval scores hand-authored NATURAL sentences (news/encyclopedic/
conversational register, full of content words absent from the seed
vocabularies) with the pure-python twin of the serving kernel, so it
runs without a Spark session and measures exactly what the engine
would predict (the kernel is shared; bucket parity is pytest-pinned).

HONEST LABEL (ADVICE r11): the round-11 vocabulary was iterated
against these sentences (88.5% -> 96.7%), so this battery is a TUNED
DEV SET and its accuracy overstates generalization. The frozen
generalization eval — authored AFTER the final vocabulary, never used
for tuning — is tools/eval_langid_holdout.py.

Usage: python tools/eval_langid_real.py   -> confusion summary + JSON line
"""

from __future__ import annotations

import hashlib
import json
import re
import sys
import os

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spatialpandas_spark.operators.langid import (  # noqa: E402
    LANGS,
    builtin_langid_model,
    margins_kernel,
)

# Natural sentences, authored for this eval (everyday register —
# weather, travel, news, daily life). Deliberately NOT drawn from the
# training generator's word-soup distribution: most content words here
# are absent from the seed vocabularies, so char n-grams must carry.
REAL_SENTENCES = {
    "en": [
        "The weather was unusually warm for this time of year.",
        "She opened the window and looked out at the quiet street.",
        "Scientists have discovered a new species of frog in the rainforest.",
        "Please remember to bring your passport to the airport.",
        "The company announced record profits in the third quarter.",
        "He spent the whole afternoon reading in the garden.",
        "The train leaves at half past seven every morning.",
        "Children love playing in the park after school.",
    ],
    "de": [
        "Das Wetter war für diese Jahreszeit ungewöhnlich warm.",
        "Sie öffnete das Fenster und blickte auf die ruhige Straße.",
        "Forscher haben im Regenwald eine neue Froschart entdeckt.",
        "Bitte denken Sie daran, Ihren Reisepass zum Flughafen mitzubringen.",
        "Das Unternehmen meldete Rekordgewinne im dritten Quartal.",
        "Er verbrachte den ganzen Nachmittag mit Lesen im Garten.",
        "Der Zug fährt jeden Morgen um halb acht ab.",
        "Die Kinder spielen nachmittags gern im Park.",
    ],
    "fr": [
        "Le temps était exceptionnellement chaud pour cette période de l'année.",
        "Elle ouvrit la fenêtre et regarda la rue tranquille.",
        "Les chercheurs ont découvert une nouvelle espèce de grenouille dans la forêt tropicale.",
        "N'oubliez pas d'apporter votre passeport à l'aéroport.",
        "L'entreprise a annoncé des bénéfices records au troisième trimestre.",
        "Il a passé tout l'après-midi à lire dans le jardin.",
        "Le train part tous les matins à sept heures et demie.",
        "Les enfants aiment jouer dans le parc l'après-midi.",
    ],
    "es": [
        "El tiempo era inusualmente cálido para esta época del año.",
        "Ella abrió la ventana y miró la calle tranquila.",
        "Los científicos han descubierto una nueva especie de rana en la selva.",
        "Por favor recuerda llevar tu pasaporte al aeropuerto.",
        "La empresa anunció ganancias récord en el tercer trimestre.",
        "Pasó toda la tarde leyendo en el jardín.",
        "El tren sale todas las mañanas a las siete y media.",
        "A los niños les gusta jugar en el parque por la tarde.",
    ],
    "it": [
        "Il tempo era insolitamente caldo per questo periodo dell'anno.",
        "Lei aprì la finestra e guardò la strada tranquilla.",
        "Gli scienziati hanno scoperto una nuova specie di rana nella foresta pluviale.",
        "Ricordati di portare il passaporto all'aeroporto.",
        "L'azienda ha annunciato profitti record nel terzo trimestre.",
        "Ha passato tutto il pomeriggio a leggere in giardino.",
        "Il treno parte ogni mattina alle sette e mezza.",
        "Ai bambini piace giocare nel parco il pomeriggio.",
    ],
    "pt": [
        "O tempo estava invulgarmente quente para esta época do ano.",
        "Ela abriu a janela e olhou para a rua tranquila.",
        "Os cientistas descobriram uma nova espécie de rã na floresta tropical.",
        "Por favor, lembre-se de levar o seu passaporte para o aeroporto.",
        "A empresa anunciou lucros recordes no terceiro trimestre.",
        "Ele passou a tarde inteira a ler no jardim.",
        "O comboio parte todas as manhãs às sete e meia.",
        "As crianças gostam de brincar no parque à tarde.",
    ],
    "ru": [
        "Погода была необычно тёплой для этого времени года.",
        "Она открыла окно и посмотрела на тихую улицу.",
        "Учёные обнаружили новый вид лягушки в тропическом лесу.",
        "Пожалуйста, не забудьте взять паспорт в аэропорт.",
        "Компания объявила о рекордной прибыли в третьем квартале.",
        "Он провёл весь день за чтением в саду.",
        "Поезд отправляется каждое утро в половине восьмого.",
        "Дети любят играть в парке после обеда.",
    ],
    "el": [
        "Ο καιρός ήταν ασυνήθιστα ζεστός για αυτή την εποχή του χρόνου.",
        "Άνοιξε το παράθυρο και κοίταξε τον ήσυχο δρόμο.",
        "Οι επιστήμονες ανακάλυψαν ένα νέο είδος βατράχου στο τροπικό δάσος.",
        "Παρακαλώ θυμηθείτε να φέρετε το διαβατήριό σας στο αεροδρόμιο.",
        "Η εταιρεία ανακοίνωσε κέρδη ρεκόρ το τρίτο τρίμηνο.",
        "Πέρασε όλο το απόγευμα διαβάζοντας στον κήπο.",
        "Το τρένο φεύγει κάθε πρωί στις επτά και μισή.",
        "Τα παιδιά αγαπούν να παίζουν στο πάρκο το απόγευμα.",
    ],
    "ar": [
        "كان الطقس دافئا بشكل غير معتاد في هذا الوقت من السنة.",
        "فتحت النافذة ونظرت إلى الشارع الهادئ.",
        "اكتشف العلماء نوعا جديدا من الضفادع في الغابة الاستوائية.",
        "من فضلك تذكر أن تحضر جواز سفرك إلى المطار.",
        "أعلنت الشركة عن أرباح قياسية في الربع الثالث.",
        "قضى بعد الظهر كله في القراءة في الحديقة.",
        "يغادر القطار كل صباح في السابعة والنصف.",
        "يحب الأطفال اللعب في الحديقة بعد الظهر.",
    ],
    "hi": [
        "साल के इस समय के लिए मौसम असामान्य रूप से गर्म था।",
        "उसने खिड़की खोली और शांत सड़क की ओर देखा।",
        "वैज्ञानिकों ने वर्षावन में मेंढक की एक नई प्रजाति खोजी है।",
        "कृपया हवाई अड्डे पर अपना पासपोर्ट लाना याद रखें।",
        "कंपनी ने तीसरी तिमाही में रिकॉर्ड मुनाफे की घोषणा की।",
        "उसने पूरी दोपहर बगीचे में पढ़ते हुए बिताई।",
        "ट्रेन हर सुबह साढ़े सात बजे निकलती है।",
        "बच्चों को दोपहर में पार्क में खेलना पसंद है।",
    ],
    "zh": [
        "今年这个时候的天气异常温暖。",
        "她打开窗户,望着安静的街道。",
        "科学家在雨林中发现了一种新的青蛙。",
        "请记得带护照去机场。",
        "公司宣布第三季度利润创下纪录。",
        "他整个下午都在花园里看书。",
        "火车每天早上七点半出发。",
        "孩子们喜欢下午在公园里玩耍。",
    ],
    "ja": [
        "今年のこの時期にしては異常に暖かい天気だった。",
        "彼女は窓を開けて静かな通りを眺めた。",
        "科学者たちは熱帯雨林で新種のカエルを発見した。",
        "空港にパスポートを持って行くのを忘れないでください。",
        "会社は第三四半期に記録的な利益を発表した。",
        "彼は午後ずっと庭で本を読んで過ごした。",
        "電車は毎朝七時半に出発します。",
        "子供たちは午後に公園で遊ぶのが好きです。",
    ],
    "ko": [
        "올해 이맘때치고는 날씨가 유난히 따뜻했다.",
        "그녀는 창문을 열고 조용한 거리를 바라보았다.",
        "과학자들은 열대 우림에서 새로운 개구리 종을 발견했다.",
        "공항에 여권을 가져가는 것을 잊지 마세요.",
        "회사는 삼분기에 기록적인 이익을 발표했다.",
        "그는 오후 내내 정원에서 책을 읽으며 보냈다.",
        "기차는 매일 아침 일곱 시 반에 출발한다.",
        "아이들은 오후에 공원에서 노는 것을 좋아한다.",
    ],
    "nl": [
        "Het weer was ongewoon warm voor deze tijd van het jaar.",
        "Ze opende het raam en keek naar de rustige straat.",
        "Wetenschappers hebben een nieuwe kikkersoort ontdekt in het regenwoud.",
        "Vergeet niet je paspoort mee te nemen naar het vliegveld.",
        "Het bedrijf kondigde recordwinsten aan in het derde kwartaal.",
        "Hij bracht de hele middag lezend door in de tuin.",
        "De trein vertrekt elke ochtend om half acht.",
        "De jongens spelen graag buiten na schooltijd.",
    ],
    "pl": [
        "Pogoda była niezwykle ciepła jak na tę porę roku.",
        "Otworzyła okno i spojrzała na spokojną ulicę.",
        "Naukowcy odkryli nowy gatunek żaby w lesie deszczowym.",
        "Pamiętaj, aby zabrać paszport na lotnisko.",
        "Firma ogłosiła rekordowe zyski w trzecim kwartale.",
        "Spędził całe popołudnie na czytaniu w ogrodzie.",
        "Pociąg odjeżdża codziennie rano o wpół do ósmej.",
        "Najmłodsi uwielbiają bawić się w parku po szkole.",
    ],
    "sv": [
        "Vädret var ovanligt varmt för den här tiden på året.",
        "Hon öppnade fönstret och tittade ut mot den lugna gatan.",
        "Forskare har upptäckt en ny grodart i regnskogen.",
        "Kom ihåg att ta med ditt pass till flygplatsen.",
        "Företaget meddelade rekordvinster under tredje kvartalet.",
        "Han tillbringade hela eftermiddagen med att läsa i trädgården.",
        "Tåget avgår varje morgon klockan halv åtta.",
        "Eleverna älskar att leka i parken efter skolan.",
    ],
    "tr": [
        "Hava yılın bu zamanı için alışılmadık derecede sıcaktı.",
        "Pencereyi açtı ve sessiz sokağa baktı.",
        "Bilim insanları yağmur ormanında yeni bir kurbağa türü keşfetti.",
        "Lütfen pasaportunu havaalanına getirmeyi unutma.",
        "Şirket üçüncü çeyrekte rekor kâr açıkladı.",
        "Bütün öğleden sonrayı bahçede kitap okuyarak geçirdi.",
        "Tren her sabah yedi buçukta kalkıyor.",
        "Öğrenciler okuldan sonra parkta oynamayı seviyor.",
    ],
    "uk": [
        "Погода була незвично теплою для цієї пори року.",
        "Вона відчинила вікно й подивилася на тиху вулицю.",
        "Вчені відкрили новий вид жаби в тропічному лісі.",
        "Будь ласка, не забудьте взяти паспорт в аеропорт.",
        "Компанія оголосила про рекордні прибутки в третьому кварталі.",
        "Він провів увесь вечір за читанням у саду.",
        "Потяг відправляється щоранку о пів на восьму.",
        "Малеча любить гратися в парку після школи.",
    ],
    "fa": [
        "هوا برای این وقت سال به طور غیرعادی گرم بود.",
        "او پنجره را باز کرد و به خیابان آرام نگاه کرد.",
        "دانشمندان گونه جدیدی از قورباغه را در جنگل بارانی کشف کردند.",
        "لطفا یادتان باشد گذرنامه را به فرودگاه بیاورید.",
        "شرکت از سود بی‌سابقه در سه‌ماهه سوم خبر داد.",
        "او تمام بعدازظهر را به خواندن در باغ گذراند.",
        "قطار هر روز صبح ساعت هفت و نیم حرکت می‌کند.",
        "بچه‌ها دوست دارند بعد از مدرسه در پارک بازی کنند.",
    ],
    "he": [
        "מזג האוויר היה חם באופן חריג לעונה זו של השנה.",
        "היא פתחה את החלון והביטה אל הרחוב השקט.",
        "מדענים גילו מין חדש של צפרדע ביער הגשם.",
        "אנא זכרו להביא את הדרכון לשדה התעופה.",
        "החברה הודיעה על רווחי שיא ברבעון השלישי.",
        "הוא בילה את כל אחר הצהריים בקריאה בגינה.",
        "הרכבת יוצאת כל בוקר בשבע וחצי.",
        "ילדים אוהבים לשחק בפארק אחרי בית הספר.",
    ],
    "th": [
        "อากาศอบอุ่นผิดปกติสำหรับช่วงเวลานี้ของปี",
        "เธอเปิดหน้าต่างและมองไปที่ถนนอันเงียบสงบ",
        "นักวิทยาศาสตร์ค้นพบกบสายพันธุ์ใหม่ในป่าฝน",
        "กรุณาอย่าลืมนำหนังสือเดินทางไปสนามบิน",
        "บริษัทประกาศกำไรสูงสุดเป็นประวัติการณ์ในไตรมาสที่สาม",
        "เขาใช้เวลาทั้งบ่ายอ่านหนังสือในสวน",
        "รถไฟออกทุกเช้าเวลาเจ็ดโมงครึ่ง",
        "เด็กๆ ชอบเล่นในสวนสาธารณะหลังเลิกเรียน",
    ],
    "vi": [
        "Thời tiết ấm áp bất thường vào lúc này trong năm.",
        "Cô ấy mở cửa sổ và nhìn ra con phố yên tĩnh.",
        "Các nhà khoa học phát hiện một loài ếch mới trong rừng mưa.",
        "Xin nhớ mang hộ chiếu đến sân bay.",
        "Công ty công bố lợi nhuận kỷ lục trong quý ba.",
        "Anh ấy dành cả buổi chiều đọc sách trong vườn.",
        "Tàu khởi hành mỗi sáng lúc bảy giờ rưỡi.",
        "Trẻ con thích chơi ở công viên sau giờ học.",
    ],
    "id": [
        "Cuaca sangat hangat untuk masa seperti sekarang.",
        "Dia membuka jendela dan memandang jalan yang sepi.",
        "Para ilmuwan menemukan spesies katak baru di hutan hujan.",
        "Tolong ingat membawa paspor ke bandara.",
        "Perusahaan mengumumkan laba rekor pada kuartal ketiga.",
        "Dia menghabiskan sepanjang sore membaca di taman.",
        "Kereta berangkat setiap pagi pukul setengah delapan.",
        "Anak kecil suka bermain di taman setelah sekolah.",
    ],
    # --- round-12 breadth languages (dev slice — tunable, same rules):
    # authored with the same travel/news/daily register as the rest
    "da": [
        "Vejret var usædvanlig varmt for årstiden.",
        "Hun åbnede vinduet og kiggede ud på den stille gade.",
        "Forskere har opdaget en ny frøart i regnskoven.",
        "Husk venligst at tage dit pas med til lufthavnen.",
        "Firmaet meldte om rekordoverskud i tredje kvartal.",
        "Han tilbragte hele eftermiddagen med at læse i haven.",
        "Toget kører hver morgen klokken halv otte.",
        "Børnene elsker at lege i parken efter skole.",
    ],
    "fi": [
        "Sää oli epätavallisen lämmin tähän aikaan vuodesta.",
        "Hän avasi ikkunan ja katseli hiljaista katua.",
        "Tutkijat löysivät uuden sammakkolajin sademetsästä.",
        "Muistathan ottaa passin mukaan lentokentälle.",
        "Yhtiö ilmoitti ennätystuloksesta kolmannella neljänneksellä.",
        "Hän vietti koko iltapäivän lukien puutarhassa.",
        "Juna lähtee joka aamu puoli kahdeksalta.",
        "Lapset leikkivät mielellään puistossa koulun jälkeen.",
    ],
    "cs": [
        "Počasí bylo na tuto roční dobu nezvykle teplé.",
        "Otevřela okno a dívala se na tichou ulici.",
        "Vědci objevili v deštném pralese nový druh žáby.",
        "Nezapomeňte si prosím vzít na letiště pas.",
        "Firma oznámila rekordní zisk za třetí čtvrtletí.",
        "Celé odpoledne strávil čtením na zahradě.",
        "Vlak odjíždí každé ráno v půl osmé.",
        "Děti si po škole rády hrají v parku.",
    ],
    "ro": [
        "Vremea era neobișnuit de caldă pentru această perioadă.",
        "A deschis fereastra și a privit strada liniștită.",
        "Cercetătorii au descoperit o nouă specie de broască în junglă.",
        "Te rog nu uita să iei pașaportul la aeroport.",
        "Compania a anunțat profituri record în trimestrul al treilea.",
        "Și-a petrecut toată după-amiaza citind în grădină.",
        "Trenul pleacă în fiecare dimineață la șapte și jumătate.",
        "Copiilor le place să se joace în parc după școală.",
    ],
    "hu": [
        "Az időjárás szokatlanul meleg volt az évszakhoz képest.",
        "Kinyitotta az ablakot és a csendes utcát nézte.",
        "A kutatók új békafajt fedeztek fel az esőerdőben.",
        "Kérlek ne felejtsd el elhozni az útleveled a repülőtérre.",
        "A cég rekordnyereséget jelentett a harmadik negyedévben.",
        "Az egész délutánt olvasással töltötte a kertben.",
        "A vonat minden reggel fél nyolckor indul.",
        "A gyerekek szeretnek iskola után a parkban játszani.",
    ],
    "bg": [
        "Времето беше необичайно топло за този сезон.",
        "Тя отвори прозореца и погледна тихата улица.",
        "Учени откриха нов вид жаба в тропическата гора.",
        "Моля, не забравяйте да вземете паспорта си за летището.",
        "Компанията обяви рекордна печалба за третото тримесечие.",
        "Той прекара целия следобед в четене в градината.",
        "Влакът тръгва всяка сутрин в седем и половина.",
        "Децата обичат да играят в парка след училище.",
    ],
    "hr": [
        "Vrijeme je bilo neobično toplo za ovo doba godine.",
        "Otvorila je prozor i gledala tihu ulicu.",
        "Znanstvenici su otkrili novu vrstu žabe u prašumi.",
        "Molim te ne zaboravi ponijeti putovnicu u zračnu luku.",
        "Tvrtka je objavila rekordnu dobit u trećem tromjesečju.",
        "Cijelo je poslijepodne proveo čitajući u vrtu.",
        "Vlak polazi svako jutro u pola osam.",
        "Djeca se vole igrati u parku poslije škole.",
    ],
    "sw": [
        "Hali ya hewa ilikuwa ya joto isivyo kawaida msimu huu.",
        "Alifungua dirisha na kutazama barabara tulivu.",
        "Wanasayansi wamegundua aina mpya ya chura msituni.",
        "Tafadhali kumbuka kuchukua pasipoti yako uwanja wa ndege.",
        "Kampuni ilitangaza faida kubwa kupita rekodi robo ya tatu.",
        "Alitumia mchana mzima akisoma bustanini.",
        "Treni huondoka kila asubuhi saa moja na nusu.",
        "Watoto hupenda kucheza bustanini baada ya shule.",
    ],
    "ur": [
        "موسم اس زمانے کے لحاظ سے غیر معمولی گرم تھا۔",
        "اس نے کھڑکی کھولی اور خاموش گلی کی طرف دیکھا۔",
        "سائنس دانوں نے برساتی جنگل میں مینڈک کی نئی قسم دریافت کی۔",
        "براہ کرم ہوائی اڈے کے لیے پاسپورٹ لانا یاد رکھیں۔",
        "کمپنی نے تیسری سہ ماہی میں ریکارڈ منافع کا اعلان کیا۔",
        "اس نے پوری دوپہر باغ میں مطالعہ کرتے گزاری۔",
        "ریل گاڑی ہر صبح ساڑھے سات بجے روانہ ہوتی ہے۔",
        "بچے اسکول کے بعد پارک میں کھیلنا پسند کرتے ہیں۔",
    ],
    "bn": [
        "এই মৌসুমের তুলনায় আবহাওয়া অস্বাভাবিক গরম ছিল।",
        "সে জানালা খুলে নিস্তব্ধ রাস্তার দিকে তাকাল।",
        "বিজ্ঞানীরা বৃষ্টিবনে ব্যাঙের নতুন প্রজাতি আবিষ্কার করেছেন।",
        "বিমানবন্দরে পাসপোর্ট নিতে ভুলবেন না দয়া করে।",
        "কোম্পানিটি তৃতীয় প্রান্তিকে রেকর্ড মুনাফার ঘোষণা দিল।",
        "সে পুরো বিকেল বাগানে বসে বই পড়ে কাটাল।",
        "ট্রেনটি প্রতিদিন সকাল সাড়ে সাতটায় ছাড়ে।",
        "বাচ্চারা স্কুলের পরে পার্কে খেলতে ভালোবাসে।",
    ],
    "ta": [
        "இந்தப் பருவத்திற்கு வானிலை அசாதாரணமாக வெப்பமாக இருந்தது.",
        "அவள் சன்னலைத் திறந்து அமைதியான தெருவைப் பார்த்தாள்.",
        "மழைக்காட்டில் புதிய தவளை இனத்தை விஞ்ஞானிகள் கண்டுபிடித்தனர்.",
        "விமான நிலையத்திற்கு கடவுச்சீட்டை எடுக்க மறக்காதீர்கள்.",
        "மூன்றாம் காலாண்டில் நிறுவனம் சாதனை லாபத்தை அறிவித்தது.",
        "அவன் மாலை முழுவதும் தோட்டத்தில் படித்துக் கழித்தான்.",
        "ரயில் தினமும் காலை ஏழரை மணிக்குப் புறப்படும்.",
        "பள்ளிக்குப் பிறகு பூங்காவில் விளையாட குழந்தைகள் விரும்புகின்றன.",
    ],
    "te": [
        "ఈ కాలానికి వాతావరణం అసాధారణంగా వేడిగా ఉంది.",
        "ఆమె కిటికీ తెరిచి నిశ్శబ్ద వీధిని చూసింది.",
        "వర్షారణ్యంలో కొత్త కప్ప జాతిని శాస్త్రవేత్తలు కనుగొన్నారు.",
        "విమానాశ్రయానికి పాస్‌పోర్ట్ తీసుకురావడం మర్చిపోవద్దు.",
        "మూడో త్రైమాసికంలో కంపెనీ రికార్డు లాభాలు ప్రకటించింది.",
        "అతను మధ్యాహ్నమంతా తోటలో చదువుతూ గడిపాడు.",
        "రైలు ప్రతి ఉదయం ఏడున్నరకు బయలుదేరుతుంది.",
        "బడి తర్వాత పిల్లలు పార్కులో ఆడుకోవడం ఇష్టపడతారు.",
    ],
    "ka": [
        "ამ სეზონისთვის ამინდი უჩვეულოდ თბილი იყო.",
        "მან ფანჯარა გააღო და მშვიდ ქუჩას გახედა.",
        "მეცნიერებმა წვიმის ტყეში ბაყაყის ახალი სახეობა აღმოაჩინეს.",
        "გთხოვთ არ დაგავიწყდეთ პასპორტის წაღება აეროპორტში.",
        "კომპანიამ მესამე კვარტალში რეკორდული მოგება გამოაცხადა.",
        "მან მთელი შუადღე ბაღში კითხვაში გაატარა.",
        "მატარებელი ყოველ დილით რვის ნახევარზე გადის.",
        "ბავშვებს სკოლის შემდეგ პარკში თამაში უყვართ.",
    ],
    "hy": [
        "Եղանակը այս սեզոնի համար անսովոր տաք էր.",
        "Նա բացեց պատուհանը և նայեց հանգիստ փողոցին.",
        "Գիտնականներն անձրևային անտառում գորտի նոր տեսակ հայտնաբերեցին.",
        "Խնդրում ենք չմոռանալ անձնագիրը վերցնել օդանավակայան.",
        "Ընկերությունը երրորդ եռամսյակում ռեկորդային շահույթ հայտարարեց.",
        "Նա ամբողջ կեսօրը գրքեր կարդալով անցկացրեց այգում.",
        "Գնացքը ամեն առավոտ մեկնում է յոթ անց կեսին.",
        "Երեխաները սիրում են դպրոցից հետո խաղալ զբոսայգում.",
    ],
    "am": [
        "የአየር ሁኔታው ለዚህ ወቅት ያልተለመደ ሞቃት ነበር።",
        "መስኮቱን ከፍታ ጸጥ ያለውን መንገድ ተመለከተች።",
        "ሳይንቲስቶች በዝናብ ደን ውስጥ አዲስ የእንቁራሪት ዝርያ አገኙ።",
        "እባክዎ ፓስፖርትዎን ወደ አውሮፕላን ማረፊያ መውሰድ አይርሱ።",
        "ኩባንያው በሦስተኛው ሩብ ዓመት ሪከርድ ትርፍ አስታወቀ።",
        "ከሰዓት በኋላውን ሙሉ በአትክልቱ ስፍራ በማንበብ አሳለፈ።",
        "ባቡሩ በየቀኑ ጠዋት ሰባት ተኩል ላይ ይነሳል።",
        "ልጆች ከትምህርት ቤት በኋላ በመናፈሻ መጫወት ይወዳሉ።",
    ],
}


def py_buckets(text: str, model: dict) -> list[int]:
    """Pure-python twin of lang_buckets (parity pytest-pinned)."""
    t = text.lower() if model["lowercase"] else text
    if model.get("max_chars") is not None:
        t = t[: model["max_chars"]]
    grams = []
    for o in model["orders"]:
        grams += [t[i : i + o] for i in range(len(t) - o + 1)]
    if model.get("include_words"):
        grams += [w for w in re.split(r"\s+", t) if w != ""]
    return [
        int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % model["n_features"]
        for g in grams
    ]


def main() -> None:
    m = builtin_langid_model()
    W = np.asarray(m["weights"])
    I = np.asarray(m["intercepts"])
    order = m["classes"]
    assert order == LANGS
    total = correct = 0
    confusions: list[tuple[str, str, str]] = []
    per_lang: dict[str, str] = {}
    for lang, sents in sorted(REAL_SENTENCES.items()):
        margins = margins_kernel(
            [py_buckets(s, m) for s in sents], W, I, m.get("len_std")
        )
        preds = [order[i] for i in np.argmax(margins, axis=1)]
        ok = sum(p == lang for p in preds)
        total += len(sents)
        correct += ok
        per_lang[lang] = f"{ok}/{len(sents)}"
        confusions += [
            (lang, p, s) for p, s in zip(preds, sents) if p != lang
        ]
    for lang, tally in per_lang.items():
        print(f"  {lang}: {tally}")
    for lang, pred, sent in confusions:
        print(f"  CONFUSED {lang} -> {pred}: {sent[:60]}")
    print(
        json.dumps(
            {
                "metric": "langid_real_text_accuracy",
                "correct": correct,
                "total": total,
                "accuracy": round(correct / total, 4),
                "per_lang": per_lang,
            }
        )
    )


if __name__ == "__main__":
    main()
